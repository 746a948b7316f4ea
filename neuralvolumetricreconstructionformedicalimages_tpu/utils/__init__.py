"""Utilities: experiment logging, profiling/timing harness."""

from .logging import ExperimentLogger  # noqa: F401
from .profiling import StepTimer, block, profiler_trace, time_fn  # noqa: F401
