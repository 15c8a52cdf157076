from .profiling import StepProfiler, enable_tpu_fast_rng, trace_profile
from .experiments import exp_details, grid_search, train_50_50

__all__ = ["StepProfiler", "enable_tpu_fast_rng", "trace_profile",
           "exp_details", "grid_search", "train_50_50"]
