"""Coverage for 3D MMS convergence, NeoHookeanEnergy, and the
lambda-variable PG functional (reference pg.hpp:216-243)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mfem_ad_tpu as ft
from mfem_ad_tpu import mesh as M
from mfem_ad_tpu.adeval import ADEval
from mfem_ad_tpu.fespace import FESpace
from mfem_ad_tpu.forms import LinearForm, NonlinearForm
from mfem_ad_tpu.norms import l2_error
from mfem_ad_tpu.solvers import NewtonOptions, newton


def _solve_poisson_3d(n0: int):
    """-lap u = f on the unit cube, u = sin(pi x) sin(pi y) sin(pi z)."""
    m = M.make_cartesian_3d(n0, n0, n0)
    fes = FESpace(m, 1)
    form = NonlinearForm(fes)
    form.add_ad_integrator(ft.DiffusionEnergy(3), ADEval.GRAD)
    form.set_essential_bc([np.ones(m.max_bdr_attribute())])

    def load(x):
        return (
            3 * np.pi**2
            * np.sin(np.pi * x[0]) * np.sin(np.pi * x[1]) * np.sin(np.pi * x[2])
        )

    b = LinearForm(fes, load).assemble()
    b[np.asarray(fes.boundary_dofs())] = 0.0
    res = newton(
        form, jnp.zeros(fes.ndof), b=jnp.asarray(b),
        opts=NewtonOptions(abs_tol=1e-12, max_iter=2, lin_solver="cg",
                           lin_tol=1e-14, preconditioner="jacobi"),
    )
    assert res.converged
    exact = lambda x: (  # noqa: E731
        np.sin(np.pi * x[0]) * np.sin(np.pi * x[1]) * np.sin(np.pi * x[2])
    )
    return l2_error(fes, np.asarray(res.x), exact)


def test_poisson_3d_mms_rate():
    e1 = _solve_poisson_3d(4)
    e2 = _solve_poisson_3d(8)
    rate = np.log2(e1 / e2)
    assert rate > 1.8  # O(h^2) for Q1


def test_neohookean_linearizes_to_linear_elasticity():
    """At grad u = 0, the neo-Hookean Hessian equals the linear-elasticity
    Hessian with the same Lame parameters."""
    lam, mu = 1.3, 0.7
    from mfem_ad_tpu.ad import LinearElasticityEnergy, NeoHookeanEnergy

    nh = NeoHookeanEnergy(2, lam, mu)
    le = LinearElasticityEnergy(2, lam, mu)
    p_nh = {"lambda": jnp.array([lam]), "mu": jnp.array([mu])}
    x0 = jnp.zeros(4)
    H_nh = np.asarray(nh.hessian(x0, p_nh))
    H_le = np.asarray(le.hessian(x0, p_nh))
    assert np.allclose(H_nh, H_le, atol=1e-12)
    # residual vanishes at the identity deformation
    assert np.allclose(np.asarray(nh.gradient(x0, p_nh)), 0.0, atol=1e-12)


def test_neohookean_solve():
    """Small 2D neo-Hookean body with a body force: Newton converges and
    the deformation is finite and nonzero."""
    from mfem_ad_tpu.ad import NeoHookeanEnergy

    m = M.make_cartesian_2d(6, 6)
    fes = FESpace(m, 1, vdim=2)
    form = NonlinearForm(fes)
    form.add_ad_integrator(
        NeoHookeanEnergy(2, 1.0, 1.0), ADEval.GRAD | ADEval.VECTOR
    )
    form.set_essential_bc([np.array([1, 0, 0, 0])])  # clamp bottom edge

    b = LinearForm(fes, lambda x: np.array([0.0, -0.5])).assemble()
    mask = np.asarray(form.ess_mask)
    b[mask] = 0.0
    res = newton(
        form, jnp.zeros(form.ndof), b=jnp.asarray(b),
        opts=NewtonOptions(abs_tol=1e-10, max_iter=30, lin_solver="dense"),
    )
    assert res.converged
    u = np.asarray(res.x)
    assert np.isfinite(u).all() and np.abs(u).max() > 1e-3


def test_lambda_pg_functional_matches_pg_fixed_point():
    """The lambda-variable functional has the same saddle point: at
    psi = psi_k + alpha*lambda the two functionals' u-gradients agree
    (pg.hpp:216-243)."""
    from mfem_ad_tpu.ad import ADFunction
    from mfem_ad_tpu.pg import ADLambdaPGFunctional, ADPGFunctional, FermiDiracEntropy

    class F(ADFunction):
        def energy(self, x, p):
            return 0.5 * x[0] ** 2 + x[1]

    ent = FermiDiracEntropy(0.0, 1.0)
    pg = ADPGFunctional(F(2), ent, None)
    lpg = ADLambdaPGFunctional(F(2), ent, None)
    alpha, psik = 2.0, 0.3
    lam = 0.45
    psi = psik + alpha * lam
    base = {
        "alpha": jnp.array([alpha]),
        "latent_k0": jnp.array([psik]),
        "entropy0_lower": jnp.array([0.0]),
        "entropy0_upper": jnp.array([1.0]),
    }
    x = jnp.array([1.2, -0.7])
    g_pg = pg.gradient(jnp.concatenate([x, jnp.array([psi])]), base)
    g_lpg = lpg.gradient(jnp.concatenate([x, jnp.array([lam])]), base)
    # u-block gradients agree at corresponding points:
    # dL/du = df/du + (psi - psi_k)/alpha = df/du + lambda
    assert np.allclose(np.asarray(g_pg[:2]), np.asarray(g_lpg[:2]), atol=1e-12)
    # dual-block stationarity maps: dL/dpsi = (u0 - dE*(psi))/alpha and
    # dL/dlam = u0 - dE*(psi_k + alpha lam): same zero set
    assert np.isclose(float(g_lpg[2]), alpha * float(g_pg[2]), atol=1e-12)
