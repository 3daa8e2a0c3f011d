from .logging import RunLogger
from .profiling import StepTimer, profile_trace

__all__ = ["RunLogger", "StepTimer", "profile_trace"]
