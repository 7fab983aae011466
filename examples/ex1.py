"""Example 1: AD Diffusion (Poisson) — reference ex1.cpp.

-Δu = 2π² sin(πx) sin(πy), u=0 on the boundary; prints the L2 error vs the
exact solution (ex1.cpp:70-75).
"""

# Allow running uninstalled: `python examples/exN.py` from a source checkout.
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

from mfem_ad_tpu.models import poisson
from mfem_ad_tpu.utils.viz import maybe_export


def main():
    ap = argparse.ArgumentParser(description="AD diffusion (reference ex1)")
    ap.add_argument("-o", "--order", type=int, default=1)
    ap.add_argument("-r", "--ref", type=int, default=1)
    ap.add_argument("--solver", default="cg",
                    choices=["cg", "dense", "minres", "gmres"])
    ap.add_argument("-pv", "--paraview", action="store_true")
    args = ap.parse_args()

    res, err, pb = poisson.solve(args.order, args.ref, lin_solver=args.solver)
    print("Error:", err)
    maybe_export(args.paraview, "ad-diffusion", pb.space, {"x": res.x})


if __name__ == "__main__":
    main()
