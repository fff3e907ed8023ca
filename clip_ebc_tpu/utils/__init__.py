from .metrics import count_errors, CountErrorAccumulator
from .logging import get_logger, MetricWriter
from .profiling import StepTimer, annotate, trace
