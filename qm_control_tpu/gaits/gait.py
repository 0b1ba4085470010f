"""Gait mode numbering and mode schedules as fixed-size JAX arrays.

Mode numbering matches OCS2 legged-robot exactly (SURVEY.md §2.2; the
reference's gait.info names map to these numbers): contact flags are ordered
(LF, RF, LH, RH) and the mode number packs them as bits

    mode = 8*LF + 4*RF + 2*LH + 1*RH      (STANCE=15, FLY=0, LF_RH=9, ...)

A ModeSchedule is the jit-safe equivalent of OCS2's ModeSchedule: padded
arrays of event times and mode ids, queryable at arbitrary t on device.
"""
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

MAX_EVENTS = 47   # fixed padding for jit (schedules are repeated gait cycles)

MODE_NAMES = {
    0: "FLY", 1: "RH", 2: "LH", 3: "LH_RH", 4: "RF", 5: "RF_RH",
    6: "RF_LH", 7: "RF_LH_RH", 8: "LF", 9: "LF_RH", 10: "LF_LH",
    11: "LF_LH_RH", 12: "LF_RF", 13: "LF_RF_RH", 14: "LF_RF_LH", 15: "STANCE",
}
_NAME_TO_MODE = {v: k for k, v in MODE_NAMES.items()}
STANCE, FLY = 15, 0


def mode_name_to_number(name: str) -> int:
    return _NAME_TO_MODE[name.upper()]


def contact_flags_from_mode(mode):
    """(4,) bool flags (LF, RF, LH, RH) from a mode number (traced ok)."""
    mode = jnp.asarray(mode)
    return jnp.stack([(mode >> 3) & 1, (mode >> 2) & 1,
                      (mode >> 1) & 1, mode & 1]).astype(bool)


def mode_from_contact_flags(flags):
    flags = jnp.asarray(flags).astype(jnp.int32)
    return 8 * flags[..., 0] + 4 * flags[..., 1] + 2 * flags[..., 2] + flags[..., 3]


class ModeSchedule(NamedTuple):
    """Padded mode schedule. event_times strictly increasing over the first
    n_events entries; modes[i] active on [event_times[i-1], event_times[i]).
    Padding: event_times filled with +big, modes repeated last."""
    event_times: jnp.ndarray   # (MAX_EVENTS,)
    modes: jnp.ndarray         # (MAX_EVENTS + 1,) int32


def mode_schedule_from_lists(event_times, modes, dtype=jnp.float32):
    """Build a padded ModeSchedule from python lists (host side)."""
    k = len(event_times)
    assert len(modes) == k + 1 and k <= MAX_EVENTS, (k, len(modes))
    et = np.full(MAX_EVENTS, 1e9, dtype=np.float64)
    et[:k] = event_times
    md = np.full(MAX_EVENTS + 1, modes[-1], dtype=np.int32)
    md[:k + 1] = modes
    return ModeSchedule(jnp.asarray(et, dtype=dtype), jnp.asarray(md))


def mode_at_time(ms: ModeSchedule, t):
    """Active mode at time t (device, branch-free)."""
    idx = jnp.searchsorted(ms.event_times, t, side="right")
    return ms.modes[idx]


def contact_flags_at_time(ms: ModeSchedule, t):
    return contact_flags_from_mode(mode_at_time(ms, t))


def foot_contact_sequence(ms: ModeSchedule, foot: int):
    """(MAX_EVENTS+1,) bool contact flag of one foot per schedule phase."""
    shift = (3, 2, 1, 0)[foot]
    return ((ms.modes >> shift) & 1).astype(bool)
