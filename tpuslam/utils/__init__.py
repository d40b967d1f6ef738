from tpuslam.utils.profiling import (
    MetricsLogger,
    StepTimer,
    profile_adapt_step,
    trace,
)

__all__ = ["MetricsLogger", "StepTimer", "profile_adapt_step", "trace"]
