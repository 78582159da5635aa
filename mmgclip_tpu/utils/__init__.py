from .logging import get_logger, logger
from .profiling import StepTimer, maybe_trace
from .seeding import Rngs, create_directory_if_not_exists, seeding
from .table import Table

__all__ = [
    "logger",
    "get_logger",
    "seeding",
    "Rngs",
    "create_directory_if_not_exists",
    "StepTimer",
    "maybe_trace",
    "Table",
]
