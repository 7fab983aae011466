"""Topology optimization: SiMPL mirror descent on a cantilever.

Drives the ``mmto`` layer (reference src/mmto.{hpp,cpp} — upstream this
layer is unfinished: absent from CMakeLists.txt:17-21 and
``SiMPLTopopt::Mult`` is an empty stub, mmto.hpp:149-151; here it is
completed).  Minimizes compliance of a clamped cantilever under a tip
load, subject to a volume fraction, via mirror descent in the
Fermi-Dirac latent variable with volume bisection.
"""

# Allow running uninstalled: `python examples/topopt.py` from a checkout.
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np

from mfem_ad_tpu.mmto import SiMPLTopopt, build_cantilever
from mfem_ad_tpu.utils.viz import maybe_export


def main():
    ap = argparse.ArgumentParser(
        description="SiMPL topology optimization (completes reference mmto)"
    )
    ap.add_argument("-nx", type=int, default=48)
    ap.add_argument("-ny", type=int, default=24)
    ap.add_argument("-o", "--order", type=int, default=1)
    ap.add_argument("-vf", "--vol-frac", type=float, default=0.5)
    ap.add_argument("-s", "--step", type=float, default=5.0)
    ap.add_argument("-mi", "--max-iter", type=int, default=60)
    ap.add_argument("-se", "--simp-exp", type=float, default=3.0)
    ap.add_argument("-pv", "--paraview", action="store_true")
    args = ap.parse_args()

    form, design, b, m, disp = build_cantilever(
        nx=args.nx, ny=args.ny, order=args.order, simp_exp=args.simp_exp
    )
    opt = SiMPLTopopt(form, design, b, vol_frac=args.vol_frac,
                      step=args.step)
    res = opt.solve(max_iter=args.max_iter, verbose=True)

    rho = np.asarray(res.rho)
    print(
        f"topopt finished: compliance {res.compliance_history[-1]:.6e} "
        f"({len(res.compliance_history)} its), "
        f"volume fraction {res.volume_history[-1]:.4f} "
        f"(target {args.vol_frac}), rho in [{rho.min():.3f}, {rho.max():.3f}]"
    )
    maybe_export(args.paraview, "topopt-design", design, {"rho": res.rho})


if __name__ == "__main__":
    main()
