"""Poisson via AD diffusion energy — reference ex1 (/root/reference/ex1.cpp).

-Δu = 2π² sin(πx) sin(πy) on [0,1]², u = 0 on the boundary;
exact solution sin(πx) sin(πy) (ex1.cpp:42-45, :70-73).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from .. import mesh as M
from ..ad import DiffusionEnergy
from ..adeval import ADEval
from ..fespace import FESpace
from ..forms import LinearForm, NonlinearForm
from ..norms import l2_error
from ..solvers import NewtonOptions, newton


def load_fn(x):
    return 2 * np.pi**2 * np.sin(np.pi * x[0]) * np.sin(np.pi * x[1])


def exact_fn(x):
    return np.sin(np.pi * x[0]) * np.sin(np.pi * x[1])


@dataclass
class Problem:
    mesh: object
    space: FESpace
    form: NonlinearForm
    rhs: object


def build(order: int = 1, ref_levels: int = 1, geom: str = "square",
          n0: int = 10) -> Problem:
    m = M.make_cartesian_2d(n0, n0, geom).uniform_refine(ref_levels)
    fes = FESpace(m, order)
    nlf = NonlinearForm(fes)
    nlf.add_ad_integrator(DiffusionEnergy(m.dim), ADEval.GRAD)
    nlf.set_essential_bc([np.ones(m.max_bdr_attribute())])
    load = LinearForm(fes, load_fn).assemble()
    load[np.asarray(fes.boundary_dofs())] = 0.0
    return Problem(mesh=m, space=fes, form=nlf, rhs=jnp.asarray(load))


def solve(order: int = 1, ref_levels: int = 1, lin_solver: str = "cg",
          geom: str = "square", n0: int = 10):
    pb = build(order, ref_levels, geom, n0)
    opts = NewtonOptions(
        abs_tol=1e-10, max_iter=3, lin_solver=lin_solver,
        lin_tol=1e-14, preconditioner="jacobi" if lin_solver == "cg" else None,
    )
    res = newton(pb.form, jnp.zeros(pb.space.ndof), b=pb.rhs, opts=opts)
    err = l2_error(pb.space, np.asarray(res.x), exact_fn)
    return res, err, pb
