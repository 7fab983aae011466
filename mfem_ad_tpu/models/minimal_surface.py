"""Minimal surface with ε-continuation — reference ex2
(/root/reference/ex2.cpp): energy sqrt(1 + ||grad u||²) + ε ||grad u||²,
Dirichlet data r cos(2θ) about the domain center, ε halved over 30
continuation passes of a Newton solve (ex2.cpp:94-99)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from .. import mesh as M
from ..ad import ADFunction
from ..adeval import ADEval
from ..coefficients import ScalarFieldCoefficient
from ..fespace import FESpace
from ..forms import NonlinearForm
from ..solvers import NewtonOptions, newton


class MinimalSurfaceEnergy(ADFunction):
    """sqrt(1 + |g|²) + eps |g|² (ex2.cpp:12-24); eps is a runtime field so
    the continuation loop reuses one compiled kernel."""

    def __init__(self, dim: int):
        super().__init__(dim)
        self.add_parameter("eps", ScalarFieldCoefficient("eps"))

    def energy(self, g, p):
        h1 = jnp.dot(g, g)
        return jnp.sqrt(h1 + 1.0) + p["eps"][0] * h1


def bdry_fn(x):
    theta = np.arctan2(x[1] - 0.5, x[0] - 0.5)
    r = np.sqrt((x[0] - 0.5) ** 2 + (x[1] - 0.5) ** 2)
    return r * np.cos(2 * theta)


@dataclass
class Problem:
    mesh: object
    space: FESpace
    form: NonlinearForm
    x0: object


def build(order: int = 1, ref_levels: int = 3, n0: int = 10) -> Problem:
    m = M.make_cartesian_2d(n0, n0).uniform_refine(ref_levels)
    fes = FESpace(m, order)
    nlf = NonlinearForm(fes)
    nlf.add_ad_integrator(MinimalSurfaceEnergy(m.dim), ADEval.GRAD)
    nlf.set_essential_bc([np.ones(m.max_bdr_attribute())])
    x0 = np.zeros(fes.ndof)
    x0 = fes.project_bdr(x0, bdry_fn)
    return Problem(mesh=m, space=fes, form=nlf, x0=jnp.asarray(x0))


def solve(
    order: int = 1,
    ref_levels: int = 3,
    continuation_steps: int = 30,
    eps0: float = 0.5,
    lin_solver: str = "cg",
    verbose: bool = False,
):
    """ε-continuation loop (ex2.cpp:94-99); Newton abs/rel tol 1e-10."""
    pb = build(order, ref_levels)
    opts = NewtonOptions(
        abs_tol=1e-10, rel_tol=1e-10, max_iter=100, lin_solver=lin_solver,
        lin_tol=1e-14,
        preconditioner="jacobi" if lin_solver in ("cg", "minres") else None,
    )
    x = pb.x0
    eps = eps0
    history = []
    for i in range(continuation_steps):
        res = newton(pb.form, x, fields={"eps": jnp.asarray(eps)}, opts=opts)
        x = res.x
        e = float(pb.form.energy(x, {"eps": jnp.asarray(0.0)}))
        history.append((eps, res.iterations, e))
        if verbose:
            print(
                f"pass {i+1:2d}: eps={eps:.3e} newton_its={res.iterations} "
                f"area={e:.9f} converged={res.converged}"
            )
        eps *= 0.5
    return x, history, pb
