from .history import WalkHistory, trace_walks
from .counters import OccupancyProfile, profile_occupancy

__all__ = [
    "WalkHistory",
    "trace_walks",
    "OccupancyProfile",
    "profile_occupancy",
]
