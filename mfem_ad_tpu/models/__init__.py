"""Model problems — the reference's examples ex0-ex5 as reusable builders.

Each module exposes ``build(...)`` returning a Problem bundle and a
``solve(...)`` driver; the scripts in ``examples/`` are thin CLI wrappers.
"""

from . import elasticity, minimal_surface, obstacle, gradient_obstacle, poisson

__all__ = [
    "poisson",
    "minimal_surface",
    "elasticity",
    "obstacle",
    "gradient_obstacle",
]
