from .schedules import make_beta_schedule, ScheduleBuffers
from .engine import DiffusionSpec, DiffusionEngine

__all__ = [
    "make_beta_schedule",
    "ScheduleBuffers",
    "DiffusionSpec",
    "DiffusionEngine",
]
