from tpuslam.utils.profiling import (
    MetricsLogger,
    StepTimer,
    profile_adapt_step,
    profile_host_pipeline,
    trace,
)

__all__ = [
    "MetricsLogger",
    "StepTimer",
    "profile_adapt_step",
    "profile_host_pipeline",
    "trace",
]
