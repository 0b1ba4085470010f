"""Round-4 closed-loop accuracy record -> ACCURACY_r04.json.

Runs the BASELINE config experiments at the reference's shipped values
plus the round-4 traverse profiles, appending each result to the JSON
as it lands (the suite takes ~2 h on CPU; partial artifacts survive
interruption).

Usage: python tools/accuracy_r04.py [section]
  sections: standing traverse disturbance tracking mpcvar   (default all)
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
    os.path.dirname(os.path.abspath(__file__))), "ACCURACY_r04.json")


def emit(entry):
    entry = {k: v for k, v in entry.items() if k not in ("log",)}
    rows = []
    if os.path.exists(PATH):
        with open(PATH) as f:
            rows = json.load(f).get("runs", [])
    rows.append(entry)
    with open(PATH, "w") as f:
        json.dump({"round": 4, "runs": rows}, f, indent=1, default=str)
    print(json.dumps(entry, default=str), flush=True)


def tuned_cfg(mu_p=12000.0, mu_o=600.0):
    from qm_control_tpu.experiments import _default_cfg
    base = _default_cfg()
    return base.with_(cost=dataclasses.replace(
        base.cost, ee_mu_position=mu_p, ee_mu_orientation=mu_o,
        final_ee_mu_position=mu_p, final_ee_mu_orientation=mu_o))


def main():
    from qm_control_tpu import experiments as E
    sections = sys.argv[1:] or ["standing", "traverse", "disturbance",
                                "tracking", "mpcvar"]

    if "standing" in sections:
        for delay in (0.0, 0.009):
            r = E.standing_ee_hold(gait="trot", delay_s=delay)
            r["delay_s"] = delay
            r["weights"] = "reference task.info"
            emit(r)

    if "traverse" in sections:
        # headline: tuned profile + deep MRT execution, gentle-walk cmd
        import qm_control_tpu.experiments as em
        orig = em._loop_cfg

        def lag3(control_freq=1000.0, delay_s=0.0):
            return orig(control_freq, delay_s)._replace(mrt_policy_lag=3)

        em._loop_cfg = lag3
        for speed, mu_o, note in ((-0.2, 600.0, "headline profile"),
                                  (-0.2, 2000.0, "ori-weighted variant")):
            r = E.traverse_ee_hold(cfg=tuned_cfg(mu_o=mu_o), speed=speed,
                                   max_time=16.0)
            r["profile"] = f"mu12000/{mu_o:g} mrt_lag3 cmd {speed}"
            r["note"] = note
            emit(r)
        # delay9 at the headline profile
        r = E.traverse_ee_hold(cfg=tuned_cfg(), speed=-0.2, max_time=16.0,
                               delay_s=0.009)
        r["profile"] = "mu12000/600 mrt_lag3 cmd -0.2 delay9"
        emit(r)
        em._loop_cfg = orig
        # honesty rows at raw reference weights, default lag
        for speed in (-0.1, -0.5):
            r = E.traverse_ee_hold(speed=speed, max_time=12.0)
            r["profile"] = f"reference task.info weights, cmd {speed}"
            emit(r)

    if "disturbance" in sections:
        # envelope with the wrench-aware MPC ON (VERDICT #2)
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

    if "tracking" in sections:
        # moving-EE speed sweep with horizon preview (VERDICT #4);
        # peak target speed = 2*pi*amplitude/period (z) ~ 0.08/0.16/0.31
        for period in (8.0, 4.0, 2.0):
            r = E.ee_tracking(period=period, preview=True)
            r["period_s"] = period
            r["peak_target_speed_ms"] = round(
                2 * 3.14159 * 0.1 / period * 1.118, 3)
            r["preview"] = True
            emit(r)
        r = E.ee_tracking(period=4.0, preview=False)
        r["period_s"] = 4.0
        r["preview"] = False
        r["note"] = "preview-off ablation (round-3 behavior)"
        emit(r)

    if "mpcvar" in sections:
        emit(E.mpc_variant_standing())


if __name__ == "__main__":
    main()
