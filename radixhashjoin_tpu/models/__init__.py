"""Query execution models: the device executor, engine facade, and planner."""

from .executor import JaxExecutor
from .engine import Engine

__all__ = ["JaxExecutor", "Engine"]
