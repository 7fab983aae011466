"""Geometric multigrid (the TPU BoomerAMG substitute, multigrid.py)."""

import numpy as np

import jax.numpy as jnp

from mfem_ad_tpu import mesh as M
from mfem_ad_tpu.ad import DiffusionEnergy, LinearElasticityEnergy
from mfem_ad_tpu.adeval import ADEval
from mfem_ad_tpu.fespace import FESpace
from mfem_ad_tpu.forms import LinearForm, NonlinearForm
from mfem_ad_tpu.multigrid import GMG, build_hierarchy
from mfem_ad_tpu.norms import l2_error
from mfem_ad_tpu.solvers import NewtonOptions, cg, newton


def _poisson_form(n):
    m = M.make_cartesian_2d(n, n)
    fes = FESpace(m, 1)
    f = NonlinearForm(fes)
    f.add_ad_integrator(DiffusionEnergy(2), ADEval.GRAD)
    f.set_essential_bc([np.ones(m.max_bdr_attribute())])
    return f


def test_transfer_adjointness():
    """restrict == prolong^T (up to the essential masks)."""
    forms = build_hierarchy(_poisson_form, 4, 2)
    gmg = GMG(forms)
    rng = np.random.default_rng(0)
    nf, nc = forms[0].ndof, forms[1].ndof
    uc = jnp.where(forms[1].ess_mask, 0.0, jnp.asarray(rng.standard_normal(nc)))
    rf = jnp.where(forms[0].ess_mask, 0.0, jnp.asarray(rng.standard_normal(nf)))
    lhs = float(jnp.dot(gmg.prolong(0, uc), rf))
    rhs = float(jnp.dot(uc, gmg.restrict(0, rf)))
    assert np.isclose(lhs, rhs, rtol=1e-12)


def test_gmg_cg_poisson_mesh_independent():
    """GMG-CG reaches machine precision in ~10 iterations where Jacobi-CG
    is stuck — and the count does not grow with the mesh."""
    for n0, levels in ((8, 3), (8, 4)):  # 32^2 and 64^2 fine grids
        forms = build_hierarchy(_poisson_form, n0, levels)
        fine = forms[0]
        state = fine.grad_state(jnp.zeros(fine.ndof))
        rng = np.random.default_rng(1)
        b = jnp.where(
            fine.ess_mask, 0.0, jnp.asarray(rng.standard_normal(fine.ndof))
        )
        mv = lambda v: fine.grad_mult(state, v)  # noqa: E731
        gmg = GMG(forms)
        x = cg(mv, b, M=gmg, tol=1e-30, maxiter=12)
        rel = float(jnp.linalg.norm(b - mv(x)) / jnp.linalg.norm(b))
        assert rel < 1e-10

        d = jnp.abs(fine.grad_diag(state))
        x_j = cg(mv, b, M=lambda r: r / d, tol=1e-30, maxiter=12)
        rel_j = float(jnp.linalg.norm(b - mv(x_j)) / jnp.linalg.norm(b))
        assert rel_j > 1e-3  # Jacobi nowhere close at the same budget


def test_gmg_newton_poisson_exact():
    forms = build_hierarchy(_poisson_form, 8, 4)
    fine = forms[0]
    fes = fine.space

    def load(x):
        return 2 * np.pi**2 * np.sin(np.pi * x[0]) * np.sin(np.pi * x[1])

    b = LinearForm(fes, load).assemble()
    b[np.asarray(fes.boundary_dofs())] = 0.0
    gmg = GMG(forms)
    res = newton(
        fine, jnp.zeros(fine.ndof), b=jnp.asarray(b),
        opts=NewtonOptions(abs_tol=1e-10, max_iter=2, lin_solver="cg",
                           lin_tol=1e-13, lin_maxiter=20,
                           preconditioner=gmg.as_preconditioner()),
    )
    assert res.converged and res.iterations == 1
    err = l2_error(
        fes, np.asarray(res.x),
        lambda x: np.sin(np.pi * x[0]) * np.sin(np.pi * x[1]),
    )
    assert err < 5e-4  # O(h^2) at 64^2


def test_gmg_elasticity_vdim():
    def build(n):
        m = M.make_cartesian_2d(n, n)
        fes = FESpace(m, 1, vdim=2)
        f = NonlinearForm(fes)
        f.add_ad_integrator(
            LinearElasticityEnergy(2, 1.0, 1.0), ADEval.GRAD | ADEval.VECTOR
        )
        f.set_essential_bc([np.array([1, 0, 0, 0])])
        return f

    forms = build_hierarchy(build, 8, 3)
    fine = forms[0]
    state = fine.grad_state(jnp.zeros(fine.ndof))
    rng = np.random.default_rng(2)
    b = jnp.where(
        fine.ess_mask, 0.0, jnp.asarray(rng.standard_normal(fine.ndof))
    )
    mv = lambda v: fine.grad_mult(state, v)  # noqa: E731
    gmg = GMG(forms)
    x = cg(mv, b, M=gmg, tol=1e-30, maxiter=25)
    rel = float(jnp.linalg.norm(b - mv(x)) / jnp.linalg.norm(b))
    assert rel < 1e-9


def test_pg_block_gmg_applies():
    """PGBlockGMG (the reference PGPreconditioner structure, pg.hpp:378-504)
    is SPD-applicable and accelerates MINRES on a mild (small-alpha) LVPP
    saddle system.  (At large alpha the saddle conditioning defeats any
    block-diagonal preconditioner — the reference's own PGPreconditioner
    is commented out in its examples for the same reason; use
    make_pg_schur_solver or the dense path there.)"""
    from mfem_ad_tpu.models import obstacle
    from mfem_ad_tpu.multigrid import PGBlockGMG
    from mfem_ad_tpu.solvers import minres

    pb = obstacle.build(order=1, ref_levels=1)
    form = pb.form

    def build_primal(n):
        m = M.make_cartesian_2d(n, n)
        fes = FESpace(m, 2)
        f = NonlinearForm(fes)
        f.add_ad_integrator(DiffusionEnergy(2), ADEval.GRAD)
        f.set_essential_bc([np.ones(m.max_bdr_attribute())])
        return f

    gmg = GMG(build_hierarchy(build_primal, 10, 2))
    pgp = PGBlockGMG(gmg, form, latent_block=1)
    fields = {
        "alpha": jnp.asarray(0.1),
        "latent_k0": jnp.zeros(pb.latent_space.ndof),
    }
    state = form.grad_state(jnp.zeros(form.ndof), fields)
    rng = np.random.default_rng(0)
    b = jnp.where(
        form.ess_mask, 0.0, jnp.asarray(rng.standard_normal(form.ndof))
    )
    mv = lambda v: form.grad_mult(state, v)  # noqa: E731
    prec = pgp.as_preconditioner()(form, state)
    x = minres(mv, b, M=prec, tol=1e-12, maxiter=300)
    rel = float(jnp.linalg.norm(b - mv(x)) / jnp.linalg.norm(b))
    assert rel < 1e-8


def _poisson_form_p(n, order):
    m = M.make_cartesian_2d(n, n)
    fes = FESpace(m, order)
    f = NonlinearForm(fes)
    f.add_ad_integrator(DiffusionEnergy(2), ADEval.GRAD)
    f.set_essential_bc([np.ones(m.max_bdr_attribute())])
    return f


def test_gmg_p_coarsening_mesh_independent():
    """hp-GMG (order-p -> Q1 subspace -> geometric): CG converges in a
    mesh-independent number of iterations for p = 2 and 3 — the role
    BoomerAMG's order-agnostic preconditioning plays for the reference
    (pg.hpp:388-400).  Measured flat: 8 iters (p=2), 16 iters (p=3) from
    16^2 to 64^2."""
    from mfem_ad_tpu.multigrid import build_hp_hierarchy

    for order, budget in ((2, 10), (3, 18)):
        for n0, levels in ((8, 2), (8, 3)):  # 16^2 and 32^2 fine meshes
            forms = build_hp_hierarchy(_poisson_form_p, n0, levels, order)
            gmg = GMG(forms)
            fine = forms[0]
            state = fine.grad_state(jnp.zeros(fine.ndof))
            rng = np.random.default_rng(1)
            b = jnp.where(
                fine.ess_mask, 0.0,
                jnp.asarray(rng.standard_normal(fine.ndof)),
            )
            mv = lambda v: fine.grad_mult(state, v)  # noqa: E731
            x = cg(mv, b, M=gmg, tol=1e-30, maxiter=budget)
            rel = float(jnp.linalg.norm(b - mv(x)) / jnp.linalg.norm(b))
            assert rel < 1e-10, (order, n0, levels, rel)


def test_p_transfer_adjointness():
    """Factor-p restrict == prolong^T."""
    from mfem_ad_tpu.multigrid import build_hp_hierarchy

    forms = build_hp_hierarchy(_poisson_form_p, 4, 1, 3)  # [Q3@4, Q1@4]
    gmg = GMG(forms)
    assert gmg.factors == [3]
    rng = np.random.default_rng(0)
    nf, nc = forms[0].ndof, forms[1].ndof
    uc = jnp.where(
        forms[1].ess_mask, 0.0, jnp.asarray(rng.standard_normal(nc))
    )
    rf = jnp.where(
        forms[0].ess_mask, 0.0, jnp.asarray(rng.standard_normal(nf))
    )
    lhs = float(jnp.dot(gmg.prolong(0, uc), rf))
    rhs = float(jnp.dot(uc, gmg.restrict(0, rf)))
    assert np.isclose(lhs, rhs, rtol=1e-12)
