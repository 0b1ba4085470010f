from .gait import (FLY, STANCE, MAX_EVENTS, ModeSchedule, contact_flags_at_time,
                   contact_flags_from_mode, mode_at_time, mode_from_contact_flags,
                   mode_schedule_from_lists, MODE_NAMES, mode_name_to_number)
from .library import GAIT_LIBRARY, GaitSchedule, ModeSequenceTemplate
from .swing import SwingConfig, swing_z_reference
