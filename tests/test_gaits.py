"""Gait layer tests: mode numbering, schedule queries, swing references."""
import jax.numpy as jnp
import numpy as np

from qm_control_tpu.gaits import (GAIT_LIBRARY, FLY, STANCE, GaitSchedule,
                                  SwingConfig, contact_flags_at_time,
                                  contact_flags_from_mode, mode_at_time,
                                  mode_from_contact_flags,
                                  mode_name_to_number, swing_z_reference)
from qm_control_tpu.gaits.gait import mode_schedule_from_lists


def test_mode_numbering():
    assert mode_name_to_number("STANCE") == 15
    assert mode_name_to_number("FLY") == 0
    assert mode_name_to_number("LF_RH") == 9
    assert mode_name_to_number("RF_LH") == 6
    assert mode_name_to_number("LF_LH") == 10
    assert mode_name_to_number("RF_RH") == 5
    assert mode_name_to_number("LF_RF_RH") == 13
    for m in range(16):
        flags = contact_flags_from_mode(m)
        assert int(mode_from_contact_flags(flags)) == m


def test_mode_schedule_query():
    ms = mode_schedule_from_lists([0.35, 0.70], [9, 6, 9])
    assert int(mode_at_time(ms, 0.1)) == 9
    assert int(mode_at_time(ms, 0.5)) == 6
    assert int(mode_at_time(ms, 0.9)) == 9
    flags = contact_flags_at_time(ms, 0.5)
    np.testing.assert_array_equal(np.asarray(flags), [False, True, True, False])


def test_gait_library_complete():
    names = {"stance", "trot", "standing_trot", "flying_trot", "pace",
             "standing_pace", "dynamic_walk", "static_walk", "amble",
             "lindyhop", "skipping", "pawup"}
    assert set(GAIT_LIBRARY) == names
    for g in GAIT_LIBRARY.values():
        assert len(g.switching_times) == len(g.mode_sequence) + 1
        assert g.duration > 0


def test_gait_schedule_tiling():
    gs = GaitSchedule()
    gs.insert_template(GAIT_LIBRARY["trot"], start_time=1.0)
    ms = gs.mode_schedule(1.0, 3.0)
    # before switch: stance
    assert int(mode_at_time(ms, 0.9)) == STANCE
    # after switch + transition: trot alternates LF_RH / RF_LH
    m1 = int(mode_at_time(ms, 1.2))
    m2 = int(mode_at_time(ms, 1.2 + 0.35))
    assert {m1, m2} == {9, 6}
    # periodicity
    assert int(mode_at_time(ms, 1.2)) == int(mode_at_time(ms, 1.2 + 0.7))


def test_swing_reference_shape():
    """Swing z: starts/ends at terrain, peaks near swingHeight mid-phase."""
    # trot: LF swings during RF_LH phase [0.35, 0.70]
    ms = mode_schedule_from_lists([0.35, 0.70, 1.05], [9, 6, 9, 6])
    cfg = SwingConfig()
    t = jnp.linspace(0.36, 0.69, 30)
    z, zd = jnp.vectorize(
        lambda tt: swing_z_reference(ms, 0, tt, 2.0, cfg),
        signature="()->(),()")(t)
    z = np.asarray(z)
    scale = min(1.0, 0.35 / cfg.swing_time_scale)
    assert abs(z.max() - cfg.swing_height * scale) < 0.02
    assert abs(z[0]) < 0.02 and abs(z[-1]) < 0.02
    # liftoff/touchdown velocities
    z0, zd0 = swing_z_reference(ms, 0, jnp.asarray(0.35), 2.0, cfg)
    z1, zd1 = swing_z_reference(ms, 0, jnp.asarray(0.70 - 1e-4), 2.0, cfg)
    np.testing.assert_allclose(float(zd0), cfg.lift_off_velocity * scale, atol=1e-3)
    np.testing.assert_allclose(float(zd1), cfg.touch_down_velocity * scale, atol=1e-2)
