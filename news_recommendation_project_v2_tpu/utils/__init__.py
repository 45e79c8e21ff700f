from .memory import estimate_tower_batch, tower_activation_bytes
from .profiling import profile_trace, timed

__all__ = [
    "estimate_tower_batch",
    "profile_trace",
    "timed",
    "tower_activation_bytes",
]
