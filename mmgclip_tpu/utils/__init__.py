from .logging import get_logger, logger
from .seeding import Rngs, create_directory_if_not_exists, seeding

__all__ = ["logger", "get_logger", "seeding", "Rngs", "create_directory_if_not_exists"]
