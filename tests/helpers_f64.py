"""float64 numpy ground-truth for the hierarchical-WBC cascade.

Replicates wbc.hoqp.hoqp_solve + wbc.qp.solve_qp semantics in float64
with converged (gated, 60-iteration) interior points — the referee used
to attribute f32 noise between the XLA cascade and the fused Pallas
kernel, and an external fixture generator that breaks golden-test
circularity (VERDICT round 1, weak #4).
"""
import numpy as np

EPS_H = 1e-6
EPS_NULL = 1e-7


def solve_qp64(H, c, G, h, iters=60, tau=0.995, gate_tol=1e-10):
    n, m = c.shape[0], h.shape[0]
    x = np.linalg.solve(H + 1e-8 * np.eye(n), -c)
    s = np.maximum(h - G @ x, 1.0)
    lam = np.ones(m)
    big = 1e30

    def maxstep(v, dv):
        r = np.where(dv < 0, -v / np.where(dv < 0, dv, -1.0), big)
        return min(1.0, r.min())

    for _ in range(iters):
        s = np.maximum(s, 1e-12); lam = np.maximum(lam, 1e-14)
        r_d = H @ x + c + G.T @ lam
        r_p = G @ x + s - h
        mu = s @ lam / m
        if mu < gate_tol and np.max(np.abs(r_p)) < gate_tol:
            break
        d = np.clip(lam / s, 1e-14, 1e10)
        M = H + G.T @ (d[:, None] * G)
        rc_aff = (-s * lam + lam * r_p) / s
        dx_a = np.linalg.solve(M, -(r_d + G.T @ rc_aff))
        ds_a = -r_p - G @ dx_a
        dl_a = (-s * lam - lam * ds_a) / s
        mu_aff = ((s + maxstep(s, ds_a) * ds_a)
                  @ (lam + maxstep(lam, dl_a) * dl_a)) / m
        sigma = np.clip((mu_aff / max(mu, 1e-14)) ** 3, 1e-6, 1.0)
        rc = (sigma * mu - s * lam - ds_a * dl_a + lam * r_p) / s
        dx = np.linalg.solve(M, -(r_d + G.T @ rc))
        ds = -r_p - G @ dx
        dlam = (sigma * mu - s * lam - ds_a * dl_a - lam * ds) / s
        ap = tau * maxstep(s, ds); ad = tau * maxstep(lam, dlam)
        x = x + ap * dx; s = s + ap * ds; lam = lam + ad * dlam
    return x


def hoqp64(tasks):
    nx = 36
    x = np.zeros(nx)
    Z = np.eye(nx)
    prev = []
    for (A, b, D, f) in tasks:
        ma, nv = A.shape[0], D.shape[0]
        Az = A @ Z
        Hz = Az.T @ Az + EPS_H * np.eye(nx)
        cz = Az.T @ (A @ x - b)
        G_rows, h_rows = [], []
        if nv > 0:
            G_rows.append(np.concatenate(
                [np.zeros((nv, nx)), -np.eye(nv)], axis=1))
            h_rows.append(np.zeros(nv))
        for (Dq, fq, vq) in prev:
            G_rows.append(np.concatenate(
                [Dq @ Z, np.zeros((Dq.shape[0], nv))], axis=1))
            h_rows.append(fq - Dq @ x + vq)
        if nv > 0:
            G_rows.append(np.concatenate([D @ Z, -np.eye(nv)], axis=1))
            h_rows.append(f - D @ x)
        H = np.zeros((nx + nv, nx + nv))
        H[:nx, :nx] = Hz
        if nv > 0:
            H[nx:, nx:] = np.eye(nv)
        c = np.concatenate([cz, np.zeros(nv)])
        zv = solve_qp64(H, c, np.concatenate(G_rows, axis=0),
                        np.concatenate(h_rows))
        z, v = zv[:nx], zv[nx:]
        x = x + Z @ z
        if nv > 0:
            prev.append((D, f, v))
        if ma > 0:
            gram = Az @ Az.T
            lamr = EPS_NULL * (np.trace(gram) / ma + 1.0)
            inv = np.linalg.solve(gram + lamr * np.eye(ma), Az)
            Z = Z @ (np.eye(nx) - Az.T @ inv)
    return x

