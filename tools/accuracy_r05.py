"""Round-5 closed-loop accuracy record -> ACCURACY_r05.json.

Same protocol as rounds 3/4 (CPU, reference 1 kHz control rate); each
run appends to the JSON as it lands so partial artifacts survive
interruption.

Usage: python tools/accuracy_r05.py <section-or-spec> ...
  sections: standing disturbance tracking mpcvar
  traverse spec: "traverse:speed=-0.3,mu_o=600,lag=3,ramp=3,max=20"
     keys: speed (m/s), mu_o (tuned mu_ori; mu_pos fixed 12000),
           lag (mrt_policy_lag), ramp (cmd ramp seconds),
           max (max_time s), delay (actuation delay s, compensated),
           tuned (0 -> raw task.info weights), note
  tracking spec: "tracking:period=4,lead=0.15"
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/qm_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

PATH = os.environ.get("ACCURACY_OUT") or os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "ACCURACY_r05.json")


def emit(entry):
    entry = {k: v for k, v in entry.items() if k not in ("log",)}
    rows = []
    if os.path.exists(PATH):
        with open(PATH) as f:
            rows = json.load(f).get("runs", [])
    rows.append(entry)
    with open(PATH, "w") as f:
        json.dump({"round": 5, "runs": rows}, f, indent=1, default=str)
    print(json.dumps(entry, default=str), flush=True)


def tuned_cfg(mu_p=12000.0, mu_o=600.0, qbase_xy: float = 1.0):
    from qm_control_tpu.experiments import _default_cfg
    base = _default_cfg()
    q = list(base.cost.q_diag)
    q[6] *= qbase_xy
    q[7] *= qbase_xy
    return base.with_(cost=dataclasses.replace(
        base.cost, q_diag=tuple(q),
        ee_mu_position=mu_p, ee_mu_orientation=mu_o,
        final_ee_mu_position=mu_p, final_ee_mu_orientation=mu_o))


def _parse_spec(spec):
    kv = {}
    if spec:
        for part in spec.split(","):
            k, _, v = part.partition("=")
            kv[k] = v
    return kv


def run_traverse(spec):
    from qm_control_tpu import experiments as E
    import qm_control_tpu.experiments as em
    kv = _parse_spec(spec)
    speed = float(kv.get("speed", -0.2))
    mu_o = float(kv.get("mu_o", 600.0))
    lag = int(kv.get("lag", 3))
    ramp = float(kv.get("ramp", 0.5))
    max_time = float(kv.get("max", 16.0))
    delay = float(kv.get("delay", 0.0))
    taper = float(kv.get("taper", 0.0))
    tuned = kv.get("tuned", "1") not in ("0", "false")
    gait = kv.get("gait", "trot")
    kp_ang = float(kv.get("kpang", 0.0))   # base-angular WBC gain
    kd_ang = float(kv.get("kdang", 0.0))   # override (dyn-reconfigure
    # parity: the reference live-tunes exactly these, wbcWigeht.cfg)
    if "qpiters" in kv:                    # closed-loop A/B of the WBC
        from qm_control_tpu.wbc import hoqp
        hoqp.DEFAULT_QP_ITERS = int(kv["qpiters"])
    qbase = float(kv.get("qbase", 1.0))
    orig = em._loop_cfg

    def lagged(control_freq=1000.0, delay_s=0.0):
        return orig(control_freq, delay_s)._replace(mrt_policy_lag=lag)
    em._loop_cfg = lagged
    try:
        cfg = tuned_cfg(mu_o=mu_o, qbase_xy=qbase) if tuned else None
        if kp_ang or kd_ang:
            cfg = cfg or em._default_cfg()
            wbc = cfg.wbc
            cfg = cfg.with_(wbc=dataclasses.replace(
                wbc,
                kp_base_angular=kp_ang or wbc.kp_base_angular,
                kd_base_angular=kd_ang or wbc.kd_base_angular))
        r = E.traverse_ee_hold(cfg=cfg, gait=gait, speed=speed,
                               max_time=max_time, delay_s=delay,
                               cmd_ramp_s=ramp, taper_dist=taper,
                               stop_gait=kv.get("stop", ""))
    finally:
        em._loop_cfg = orig
    prof = (f"mu12000/{mu_o:g}" if tuned else "reference task.info weights")
    if gait != "trot":
        prof += f" {gait}"
    if kv.get("stop"):
        prof += f" stop->{kv['stop']}"
    r["profile"] = (f"{prof} mrt_lag{lag} cmd {speed} ramp {ramp:g}"
                    + (f" taper{taper:g}" if taper else "")
                    + (f" qbase{qbase:g}" if qbase != 1.0 else "")
                    + (f" kpang{kp_ang:g}" if kp_ang else "")
                    + (f" kdang{kd_ang:g}" if kd_ang else "")
                    + (f" delay{delay * 1e3:g}ms(comp)" if delay else ""))
    if "note" in kv:
        r["note"] = kv["note"]
    if "save" in kv:
        from qm_control_tpu.utils.viz import export_trajectory
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dst = os.path.join(root, "docs", "runs")
        os.makedirs(dst, exist_ok=True)
        npz = os.path.join(dst, kv["save"] + ".npz")
        export_trajectory(r["log"], npz)
        r["log_npz"] = os.path.relpath(npz, root)
    emit(r)


def run_tracking(spec):
    from qm_control_tpu import experiments as E
    kv = _parse_spec(spec)
    period = float(kv.get("period", 4.0))
    lead = float(kv.get("lead", 0.0))
    tuned = kv.get("tuned", "0") not in ("0", "false")
    preview = kv.get("preview", "1") not in ("0", "false")
    lag = int(kv.get("lag", 1))
    kwargs = {}
    if lead:
        kwargs["target_lead_s"] = lead
    r = E.ee_tracking(cfg=tuned_cfg() if tuned else None, period=period,
                      preview=preview, mrt_policy_lag=lag, **kwargs)
    r["period_s"] = period
    r["peak_target_speed_ms"] = round(2 * 3.14159 * 0.1 / period * 1.118, 3)
    r["preview"] = preview
    r["target_lead_s"] = lead
    r["mrt_policy_lag"] = lag
    if tuned:
        r["note"] = "tuned mu12000/600"
    if "note" in kv:
        r["note"] = kv["note"]
    emit(r)


def run_ext(spec):
    """Extended-arm trot-in-place (the traverse-wall fast repro)."""
    from qm_control_tpu import experiments as E
    kv = _parse_spec(spec)
    d = float(kv.get("d", 0.25))
    lag = int(kv.get("lag", 1))
    dur = float(kv.get("dur", 6.0))
    kp_ang = float(kv.get("kpang", 0.0))
    kd_ang = float(kv.get("kdang", 0.0))
    gains = None
    if kp_ang or kd_ang:
        from qm_control_tpu.experiments import _default_cfg
        wbc = _default_cfg().wbc
        gains = dataclasses.replace(
            wbc, kp_base_angular=kp_ang or wbc.kp_base_angular,
            kd_base_angular=kd_ang or wbc.kd_base_angular)
    tuned = kv.get("tuned", "0") not in ("0", "false")
    cfg = tuned_cfg(mu_o=float(kv.get("mu_o", 600.0))) if tuned else None
    r = E.standing_ee_hold(cfg=cfg, gait=kv.get("gait", "trot"),
                           duration=dur, ee_offset_x=d,
                           mrt_policy_lag=lag, gains=gains)
    r["profile"] = (f"ext{d:g} lag{lag} dur{dur:g}"
                    + (" tuned" if tuned else " raw")
                    + (f" kpang{kp_ang:g}" if kp_ang else "")
                    + (f" kdang{kd_ang:g}" if kd_ang else ""))
    if "note" in kv:
        r["note"] = kv["note"]
    if "save" in kv:
        from qm_control_tpu.utils.viz import export_trajectory
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dst = os.path.join(root, "docs", "runs")
        os.makedirs(dst, exist_ok=True)
        npz = os.path.join(dst, kv["save"] + ".npz")
        export_trajectory(r["log"], npz)
        r["log_npz"] = os.path.relpath(npz, root)
    emit(r)


def main():
    from qm_control_tpu import experiments as E
    args = sys.argv[1:] or ["standing"]
    for arg in args:
        if arg.startswith("ext"):
            run_ext(arg.partition(":")[2])
        elif arg.startswith("traverse"):
            run_traverse(arg.partition(":")[2])
        elif arg.startswith("tracking"):
            run_tracking(arg.partition(":")[2])
        elif arg == "standing":
            from qm_control_tpu.wbc import hoqp
            import inspect
            qp_iters = inspect.signature(
                hoqp.hoqp_solve).parameters["qp_iters"].default
            for delay in (0.0, 0.009):
                r = E.standing_ee_hold(gait="trot", delay_s=delay)
                r["delay_s"] = delay
                r["delay_compensated"] = bool(delay)
                r["weights"] = "reference task.info"
                r["wbc_qp_iters"] = qp_iters
                emit(r)
        elif arg == "disturbance":
            for force in (15.0, 20.0, 25.0, 30.0):
                r = E.disturbance_rejection(ee_force=force,
                                            mpc_wrench_feedthrough=True)
                r["mpc_wrench_feedthrough"] = True
                emit(r)
            r = E.disturbance_rejection(ee_force=25.0,
                                        mpc_wrench_feedthrough=False)
            r["mpc_wrench_feedthrough"] = False
            r["note"] = "OFF contrast at 25 N (WBC-only bracing)"
            emit(r)
        elif arg == "mpcvar":
            emit(E.mpc_variant_standing())
        else:
            raise SystemExit(f"unknown arg {arg}")


if __name__ == "__main__":
    main()
