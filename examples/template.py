"""Serial example skeleton — reference template/template.cpp.

Options parsing, mesh construction + refinement, FE space, a projected
field, and optional GLVis / ParaView (VTU) export: the starting point for
writing a new driver, mirroring the reference's template structure
(template/template.cpp:1-90).
"""

# Allow running uninstalled: `python examples/exN.py` from a source checkout.
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np

from mfem_ad_tpu import mesh as M
from mfem_ad_tpu.fespace import FESpace
from mfem_ad_tpu.quadrature import SQUARE, TRIANGLE
from mfem_ad_tpu.utils.viz import maybe_export


def main():
    ap = argparse.ArgumentParser(description="driver skeleton (template.cpp)")
    ap.add_argument("-m", "--mesh", default=None,
                    help="MFEM mesh file (default: built-in Cartesian)")
    ap.add_argument("-n", type=int, default=10, help="cells per side")
    ap.add_argument("-o", "--order", type=int, default=1)
    ap.add_argument("-r", "--ref", type=int, default=0,
                    help="uniform refinement levels")
    ap.add_argument("--tri", action="store_true", help="triangle mesh")
    ap.add_argument("-vis", "--visualization", action="store_true",
                    help="send the field to a running GLVis server")
    ap.add_argument("-pv", "--paraview", action="store_true",
                    help="write a VTU file for ParaView")
    args = ap.parse_args()

    if args.mesh:
        m = M.read_mfem_mesh(args.mesh)
    else:
        geom = TRIANGLE if args.tri else SQUARE
        m = M.make_cartesian_2d(args.n, args.n, geom)
    m = m.uniform_refine(args.ref)
    print(f"mesh: {m.num_elements} elements, {m.num_vertices} vertices")

    fes = FESpace(m, args.order)
    print(f"space: order {args.order}, {fes.ndof} dofs")

    u = fes.project(lambda x: np.sin(np.pi * x[0]) * np.sin(np.pi * x[1]))

    if args.visualization:
        from mfem_ad_tpu.utils.glvis import GLVis

        g = GLVis()
        g.append(fes, u, name="u")
        g.update()
    maybe_export(args.paraview, "template", fes, {"u": u})


if __name__ == "__main__":
    main()
