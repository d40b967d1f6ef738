from tpuslam.utils.profiling import MetricsLogger, StepTimer, trace

__all__ = ["MetricsLogger", "StepTimer", "trace"]
