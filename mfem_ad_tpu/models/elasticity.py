"""Vector linear elasticity — reference ex3 (/root/reference/ex3.cpp):
LinearElasticityEnergy with GRAD|VECTOR mode, unit body force, clamped on
boundary attribute 4 (the left side), single linear solve."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from .. import mesh as M
from ..ad import LinearElasticityEnergy
from ..adeval import ADEval
from ..fespace import FESpace
from ..forms import LinearForm, NonlinearForm
from ..solvers import NewtonOptions, newton


@dataclass
class Problem:
    mesh: object
    space: FESpace
    form: NonlinearForm
    rhs: object


def build(
    order: int = 1,
    ref_levels: int = 3,
    lam: float = 1.0,
    mu: float = 1.0,
    n0: int = 10,
    dim: int = 2,
    geom: str | None = None,
) -> Problem:
    from ..quadrature import TETRAHEDRON, TRIANGLE

    if dim == 2:
        g = TRIANGLE if geom in ("tri", TRIANGLE) else None
        m = (M.make_cartesian_2d(n0, n0, g) if g
             else M.make_cartesian_2d(n0, n0)).uniform_refine(ref_levels)
    else:
        g = TETRAHEDRON if geom in ("tet", TETRAHEDRON) else None
        m = (M.make_cartesian_3d(n0, n0, n0, geom=g) if g
             else M.make_cartesian_3d(n0, n0, n0)).uniform_refine(ref_levels)
    fes = FESpace(m, order, vdim=dim)
    nlf = NonlinearForm(fes)
    nlf.add_ad_integrator(
        LinearElasticityEnergy(dim, lam, mu), ADEval.GRAD | ADEval.VECTOR
    )
    # ex3.cpp:52-54: only boundary attribute 4 (left side) is essential
    ess = np.zeros(m.max_bdr_attribute())
    ess[3] = 1
    nlf.set_essential_bc([ess])
    load = LinearForm(fes, lambda x: np.ones(dim)).assemble()
    load[np.asarray(fes.essential_dofs(ess))] = 0.0
    return Problem(mesh=m, space=fes, form=nlf, rhs=jnp.asarray(load))


def solve(order: int = 1, ref_levels: int = 3, lin_solver: str = "cg",
          dim: int = 2, geom: str | None = None):
    pb = build(order, ref_levels, dim=dim, geom=geom)
    opts = NewtonOptions(
        abs_tol=1e-10, max_iter=3, lin_solver=lin_solver, lin_tol=1e-14,
        lin_maxiter=20000,
        preconditioner="jacobi" if lin_solver == "cg" else None,
    )
    res = newton(pb.form, jnp.zeros(pb.space.ndof), b=pb.rhs, opts=opts)
    return res, pb
