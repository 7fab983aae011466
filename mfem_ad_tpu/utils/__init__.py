"""Utilities & observability: logging, export, checkpointing.

Covers the reference's L4 layer (src/tools.hpp, src/logger.{hpp,cpp}) plus
the checkpoint/resume subsystem the reference lacks (SURVEY.md §5).
"""

from .logger import TableLogger
from .checkpoint import save_checkpoint, load_checkpoint
from .vtk import write_vtu
from . import profiling

__all__ = ["TableLogger", "save_checkpoint", "load_checkpoint", "write_vtu",
           "profiling"]
