"""Example 2: AD Minimal Surface — reference ex2.cpp.

Energy sqrt(1+||grad u||²) + ε||grad u||², 30 ε-continuation passes with
ε halved each time (ex2.cpp:94-99); Newton tol 1e-10."""

# Allow running uninstalled: `python examples/exN.py` from a source checkout.
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

from mfem_ad_tpu.models import minimal_surface
from mfem_ad_tpu.utils.viz import maybe_export


def main():
    ap = argparse.ArgumentParser(description="AD minimal surface (ref ex2)")
    ap.add_argument("-o", "--order", type=int, default=1)
    ap.add_argument("-r", "--ref", type=int, default=3)
    ap.add_argument("-n", "--steps", type=int, default=30)
    ap.add_argument("--solver", default="cg",
                    choices=["cg", "dense", "minres", "gmres"])
    ap.add_argument("-pv", "--paraview", action="store_true")
    args = ap.parse_args()

    x, hist, pb = minimal_surface.solve(
        args.order, args.ref, continuation_steps=args.steps,
        lin_solver=args.solver, verbose=True,
    )
    maybe_export(args.paraview, "ad-minimalsurface", pb.space, {"x": x})


if __name__ == "__main__":
    main()
