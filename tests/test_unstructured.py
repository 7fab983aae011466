"""Solve-level coverage of the generic-gather assembly path on genuinely
unstructured meshes (VERDICT r2 #9): the reference inherits this from MFEM
for any mesh file; here the `data/sloped_rectangle.mesh` triangle mesh
(refined) and a randomly perturbed (non-affine) quad mesh each drive a
full Newton solve with an MMS convergence-rate check."""

import numpy as np
import pytest

import jax.numpy as jnp

from mfem_ad_tpu import mesh as M
from mfem_ad_tpu.ad import DiffusionEnergy
from mfem_ad_tpu.adeval import ADEval
from mfem_ad_tpu.fespace import FESpace
from mfem_ad_tpu.forms import LinearForm, NonlinearForm
from mfem_ad_tpu.norms import l2_error
from mfem_ad_tpu.solvers import NewtonOptions, newton

MESH_PATH = "/root/reference/data/sloped_rectangle.mesh"


def exact_fn(x):
    return np.sin(np.pi * x[0]) * np.sin(np.pi * x[1])


def load_fn(x):
    return 2 * np.pi**2 * np.sin(np.pi * x[0]) * np.sin(np.pi * x[1])


def _solve_poisson(m, order):
    """-lap u = f with Dirichlet data from the exact solution (MMS)."""
    fes = FESpace(m, order)
    nlf = NonlinearForm(fes)
    nlf.add_ad_integrator(DiffusionEnergy(m.dim), ADEval.GRAD)
    nlf.set_essential_bc([np.ones(m.max_bdr_attribute())])
    load = LinearForm(fes, load_fn).assemble()
    load[np.asarray(fes.boundary_dofs())] = 0.0
    x0 = fes.project_bdr(np.zeros(fes.ndof), exact_fn)
    res = newton(
        nlf, jnp.asarray(x0), b=jnp.asarray(load),
        opts=NewtonOptions(
            abs_tol=1e-12, max_iter=3, lin_solver="cg", lin_tol=1e-14,
            preconditioner="jacobi",
        ),
    )
    assert res.converged
    return l2_error(fes, np.asarray(res.x), exact_fn)


def test_affine_pullback_matches_generic():
    """Affine unstructured meshes route through the reference-basis
    pullback (shared B + _PullbackEnergy, round 4): energy/residual/
    Jacobian/diagonal must match the generic physical-B path exactly."""
    import jax

    from mfem_ad_tpu.ad import NeoHookeanEnergy
    from mfem_ad_tpu.adeval import ADEval
    from mfem_ad_tpu.forms import NonlinearForm
    from mfem_ad_tpu.integrator import ADBlockIntegrator

    m = M.read_mfem_mesh(MESH_PATH).uniform_refine(2)

    def build(pullback: bool, monkey=None):
        import os

        os.environ["MFEM_AD_TPU_PULLBACK"] = "1" if pullback else "0"
        try:
            fes = FESpace(m, 1, vdim=2)
            f = NonlinearForm(fes)
            f.add_ad_integrator(
                NeoHookeanEnergy(2, 1.0, 1.0), ADEval.GRAD | ADEval.VECTOR
            )
            return fes, f
        finally:
            del os.environ["MFEM_AD_TPU_PULLBACK"]

    fes, fp = build(True)
    _, fg = build(False)
    assert fp.integrators[0].pullback
    assert not fg.integrators[0].pullback
    assert fp.integrators[0].tables["B"][0].shape[0] == 1  # shared Bref

    rng = np.random.default_rng(5)
    u = jnp.asarray(0.02 * rng.standard_normal(fes.ndof))
    assert np.isclose(float(fp.energy(u)), float(fg.energy(u)), rtol=1e-10)
    rp, rg = np.asarray(fp.mult(u)), np.asarray(fg.mult(u))
    assert np.allclose(rp, rg, atol=1e-10 * max(1.0, np.abs(rg).max()))
    sp, sg = fp.grad_state(u), fg.grad_state(u)
    Ap, Ag = fp.assemble_dense(sp), fg.assemble_dense(sg)
    assert np.allclose(Ap, Ag, atol=1e-8 * np.abs(Ag).max())
    v = jnp.asarray(rng.standard_normal(fes.ndof))
    assert np.allclose(
        np.asarray(fp.grad_mult(sp, v)), np.asarray(fg.grad_mult(sg, v)),
        atol=1e-8 * np.abs(Ag).max(),
    )
    assert np.allclose(
        np.asarray(fp.grad_diag(sp)), np.asarray(fg.grad_diag(sg)),
        atol=1e-8 * np.abs(Ag).max(),
    )


@pytest.mark.parametrize("order", [1, 2])
def test_sloped_rectangle_mms_rate(order):
    """L2 rate ~ h^{p+1} through the unstructured-triangle gather path."""
    base = 3 if order == 1 else 2
    m = M.read_mfem_mesh(MESH_PATH).uniform_refine(base)
    assert m.structured is None  # generic path, element-varying Jacobians
    e_coarse = _solve_poisson(m, order)
    e_fine = _solve_poisson(m.uniform_refine(1), order)
    rate = np.log2(e_coarse / e_fine)
    assert rate > order + 0.7, (e_coarse, e_fine, rate)


def _perturbed_quad_mesh(n, amp=0.15, seed=0):
    """Cartesian quad mesh with interior vertices jittered: every element
    gets a genuinely bilinear (non-affine) geometry map, so detJ/invJ vary
    per quadrature point — the regime the uniform-Jacobian fast path must
    not claim."""
    m = M.make_cartesian_2d(n, n)
    v = np.array(m.vertices)
    interior = ~(
        np.isclose(v[:, 0], 0) | np.isclose(v[:, 0], 1)
        | np.isclose(v[:, 1], 0) | np.isclose(v[:, 1], 1)
    )
    rng = np.random.default_rng(seed)
    h = 1.0 / n
    v[interior] += amp * h * rng.uniform(-1, 1, size=(interior.sum(), 2))
    return M.Mesh(
        geom=m.geom, vertices=v, elements=m.elements,
        attributes=m.attributes, bdr_elements=m.bdr_elements,
        bdr_attributes=m.bdr_attributes, structured=None,
    )


@pytest.mark.parametrize("order", [1, 2])
def test_perturbed_quad_mms_rate(order):
    """Non-affine quad geometry (per-qp Jacobians) drives a full solve.
    The same fixed perturbation pattern is scaled down with h, preserving
    the asymptotic O(h^{p+1}) rate."""
    base = 12 if order == 1 else 8
    e_coarse = _solve_poisson(_perturbed_quad_mesh(base), order)
    e_fine = _solve_poisson(_perturbed_quad_mesh(2 * base), order)
    rate = np.log2(e_coarse / e_fine)
    assert rate > order + 0.6, (e_coarse, e_fine, rate)


def test_nonaffine_pullback_matches_generic(monkeypatch):
    """Round 5 (VERDICT r4 #8): element-varying-J meshes (perturbed
    quads) route through the reference-basis pullback with a per-qp
    _invj table; energy/residual/Jacobian must match the generic
    physical-B path exactly."""
    from mfem_ad_tpu.ad import NeoHookeanEnergy
    from mfem_ad_tpu.integrator import ADBlockIntegrator

    m = _perturbed_quad_mesh(4)
    fes = FESpace(m, 2, vdim=2)
    rng = np.random.default_rng(2)
    u = jnp.asarray(0.02 * rng.standard_normal(fes.ndof))

    def build():
        return ADBlockIntegrator(
            NeoHookeanEnergy(2, 1.0, 1.0), [fes],
            [ADEval.GRAD | ADEval.VECTOR],
        )

    monkeypatch.setenv("MFEM_AD_TPU_PULLBACK", "0")
    i_gen = build()
    assert not i_gen.pullback
    monkeypatch.delenv("MFEM_AD_TPU_PULLBACK")
    i_pb = build()
    assert i_pb.pullback

    e0, e1 = float(i_gen.energy([u])), float(i_pb.energy([u]))
    assert np.isclose(e0, e1, rtol=1e-12)
    r0 = np.asarray(i_gen.residual([u])[0])
    r1 = np.asarray(i_pb.residual([u])[0])
    assert np.allclose(r0, r1, atol=1e-11 * max(1, np.abs(r0).max()))
    A0 = np.asarray(i_gen.element_matrices(i_gen.hess_state([u]), 0, 0))
    A1 = np.asarray(i_pb.element_matrices(i_pb.hess_state([u]), 0, 0))
    assert np.allclose(A0, A1, atol=1e-10 * max(1, np.abs(A0).max()))
