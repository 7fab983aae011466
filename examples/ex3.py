"""Example 3: AD Linear Elasticity with vector FE — reference ex3.cpp.

LinearElasticityEnergy with GRAD|VECTOR mode, unit body load, clamped on
boundary attribute 4; single linear solve (ex3.cpp:70-74)."""

# Allow running uninstalled: `python examples/exN.py` from a source checkout.
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np

from mfem_ad_tpu.models import elasticity
from mfem_ad_tpu.utils.viz import maybe_export


def main():
    ap = argparse.ArgumentParser(description="AD elasticity (reference ex3)")
    ap.add_argument("-o", "--order", type=int, default=1)
    ap.add_argument("-r", "--ref", type=int, default=3)
    ap.add_argument("-d", "--dim", type=int, default=2, choices=[2, 3])
    ap.add_argument("--geom", default=None, choices=[None, "tri", "tet"],
                    help="simplex mesh (tri in 2D, tet in 3D; default "
                         "quad/hex)")
    ap.add_argument("--solver", default="cg",
                    choices=["cg", "dense", "minres", "gmres"])
    ap.add_argument("-pv", "--paraview", action="store_true")
    args = ap.parse_args()

    res, pb = elasticity.solve(args.order, args.ref,
                               lin_solver=args.solver, dim=args.dim,
                               geom=args.geom)
    u = np.asarray(res.x)
    print("converged:", res.converged, " |u|_max:", np.abs(u).max())
    maybe_export(args.paraview, "ad-elasticity", pb.space, {"x": res.x})


if __name__ == "__main__":
    main()
