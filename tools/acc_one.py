"""Run ONE named accuracy run (for parallel section execution).

Usage: ACCURACY_OUT=/tmp/acc_X.json python tools/acc_one.py <run>
  runs: headline ori2000 delay9 raw01 raw05 standing tracking8
        tracking4 tracking2 trackoff mpcvar
Each appends to $ACCURACY_OUT; merge with tools/acc_merge.py.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.accuracy_r04 import emit, tuned_cfg  # noqa: E402


def traverse(speed, mu_o, note, lag=3, delay=0.0, max_time=16.0, tuned=True,
             ramp=0.5):
    from qm_control_tpu import experiments as E
    import qm_control_tpu.experiments as em
    orig = em._loop_cfg

    # patch the requested lag unconditionally (lag=0 must actually run
    # lag 0, not the loop default of 1)
    def lagged(control_freq=1000.0, delay_s=0.0):
        return orig(control_freq, delay_s)._replace(mrt_policy_lag=lag)
    em._loop_cfg = lagged
    try:
        cfg = tuned_cfg(mu_o=mu_o) if tuned else None
        r = E.traverse_ee_hold(cfg=cfg, speed=speed, max_time=max_time,
                               delay_s=delay, cmd_ramp_s=ramp)
    finally:
        em._loop_cfg = orig
    prof = (f"mu12000/{mu_o:g}" if tuned else "reference task.info weights")
    r["profile"] = (f"{prof} mrt_lag{lag} cmd {speed} ramp {ramp:g}"
                    + (" delay9" if delay else ""))
    r["note"] = note
    emit(r)


def main():
    from qm_control_tpu import experiments as E
    run = sys.argv[1]
    if run == "headline":
        traverse(-0.2, 600.0, "headline profile")
    elif run == "headline3":
        traverse(-0.3, 600.0, "headline profile, faster command")
    elif run == "combo_a":
        traverse(-0.3, 2000.0, "slow-stick ramp, ori-weighted",
                 ramp=3.0, max_time=20.0)
    elif run == "combo_b":
        traverse(-0.3, 600.0, "slow-stick ramp", ramp=3.0, max_time=20.0)
    elif run == "combo_c":
        traverse(-0.25, 2000.0, "slow-stick ramp, ori-weighted",
                 ramp=2.0, max_time=20.0)
    elif run == "raw01lag":
        traverse(-0.1, 1000.0, "raw weights + deep MRT (VERDICT #6)",
                 max_time=16.0, tuned=False)
    elif run == "ori2000":
        traverse(-0.2, 2000.0, "ori-weighted variant")
    elif run == "delay9":
        traverse(-0.2, 600.0, "headline + 9ms actuation delay", delay=0.009)
    elif run == "raw01":
        traverse(-0.1, 1000.0, "raw weights honesty row", lag=0,
                 max_time=12.0, tuned=False)
    elif run == "raw05":
        traverse(-0.5, 1000.0, "raw weights honesty row", lag=0,
                 max_time=12.0, tuned=False)
    elif run == "standing":
        for delay in (0.0, 0.009):
            r = E.standing_ee_hold(gait="trot", delay_s=delay)
            r["delay_s"] = delay
            r["weights"] = "reference task.info"
            emit(r)
    elif run.startswith("tracking"):
        period = float(run[len("tracking"):])
        r = E.ee_tracking(period=period, preview=True)
        r["period_s"] = period
        r["peak_target_speed_ms"] = round(2 * 3.14159 * 0.1 / period * 1.118,
                                          3)
        r["preview"] = True
        emit(r)
    elif run == "trackingtuned":
        r = E.ee_tracking(cfg=tuned_cfg(), period=4.0, preview=True)
        r["period_s"] = 4.0
        r["peak_target_speed_ms"] = 0.176
        r["preview"] = True
        r["note"] = "tuned mu12000/600 (plan-space probe reads 1.52 mm)"
        emit(r)
    elif run == "trackoff":
        r = E.ee_tracking(period=4.0, preview=False)
        r["period_s"] = 4.0
        r["preview"] = False
        r["note"] = "preview-off ablation (round-3 behavior)"
        emit(r)
    elif run == "mpcvar":
        emit(E.mpc_variant_standing())
    else:
        raise SystemExit(f"unknown run {run}")


if __name__ == "__main__":
    main()
