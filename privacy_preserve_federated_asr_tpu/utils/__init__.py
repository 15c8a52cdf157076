from .profiling import StepProfiler, trace_profile
from .experiments import exp_details, grid_search, train_50_50

__all__ = ["StepProfiler", "trace_profile", "exp_details", "grid_search",
           "train_50_50"]
