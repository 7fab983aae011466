"""Packed symmetric Newton state (integrator.SymHess) — round 4.

The Krylov matvec reads the per-qp Hessian state from HBM every iteration;
packing the upper triangle [ne, nq, n(n+1)/2] must be bit-compatible with
the full-tensor path at the operator level (the state itself is
symmetrized, so agreement is to roundoff of the AD asymmetry).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mfem_ad_tpu import fespace, mesh
from mfem_ad_tpu.ad import DiffusionEnergy, LinearElasticityEnergy
from mfem_ad_tpu.adeval import ADEval
from mfem_ad_tpu.integrator import ADBlockIntegrator, SymHess, _tri_maps
from mfem_ad_tpu.models import obstacle


def _poisson_intg():
    m = mesh.make_cartesian_2d(4, 4)
    fes = fespace.FESpace(m, order=2)
    f = DiffusionEnergy(dim=2)
    return ADBlockIntegrator(f, [fes], [ADEval.GRAD]), fes


def test_tri_maps_roundtrip():
    for n in (1, 2, 4, 9):
        SU, SL, SUo, expand = _tri_maps(n)
        K = n * (n + 1) // 2
        assert SU.shape == (n, K) and expand.shape == (n * n,)
        # expand must reconstruct a symmetric matrix from its triangle
        rng = np.random.default_rng(n)
        H = rng.standard_normal((n, n))
        H = 0.5 * (H + H.T)
        tri = np.array([H[a, b] for a in range(n) for b in range(a, n)])
        assert np.allclose(tri[expand].reshape(n, n), H)


def test_symhess_full_matches_dense_state():
    intg, fes = _poisson_intg()
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(fes.ndof))
    Hq = np.asarray(intg.hess_state([u]))
    sh = intg.hess_state([u], sym=True)
    assert isinstance(sh, SymHess)
    assert sh.shape == Hq.shape
    full = np.asarray(sh.full())
    # full() symmetrizes; the dense state is symmetric to AD roundoff
    assert np.allclose(full, 0.5 * (Hq + np.swapaxes(Hq, -1, -2)),
                       atol=1e-13)
    assert np.allclose(full, Hq, atol=1e-12)


def test_symhess_matvec_matches_full():
    intg, fes = _poisson_intg()
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(fes.ndof))
    v = jnp.asarray(rng.standard_normal(fes.ndof))
    Hq = intg.hess_state([u])
    sh = intg.hess_state([u], sym=True)
    y_full = np.asarray(intg.hess_mult(Hq, [v])[0])
    y_sym = np.asarray(intg.hess_mult(sh, [v])[0])
    scale = np.abs(y_full).max()
    assert np.abs(y_sym - y_full).max() < 1e-12 * max(scale, 1.0)
    d_full = np.asarray(intg.diagonal(Hq)[0])
    d_sym = np.asarray(intg.diagonal(sh)[0])
    assert np.allclose(d_sym, d_full, atol=1e-12 * max(scale, 1.0))
    A_full = np.asarray(intg.element_matrices(Hq, 0, 0))
    A_sym = np.asarray(intg.element_matrices(sh, 0, 0))
    assert np.abs(A_sym - A_full).max() < 1e-12 * max(scale, 1.0)


def test_symhess_vector_energy():
    """vdim > 1 (elasticity, n_input = 4 in 2D) through the packed path."""
    m = mesh.make_cartesian_2d(3, 3)
    fes = fespace.FESpace(m, order=1, vdim=2)
    f = LinearElasticityEnergy(dim=2, lam=1.0, mu=0.7)
    intg = ADBlockIntegrator(f, [fes], [ADEval.GRAD | ADEval.VECTOR])
    rng = np.random.default_rng(2)
    u = jnp.asarray(0.1 * rng.standard_normal(fes.ndof))
    v = jnp.asarray(rng.standard_normal(fes.ndof))
    y_full = np.asarray(intg.hess_mult(intg.hess_state([u]), [v])[0])
    y_sym = np.asarray(intg.hess_mult(intg.hess_state([u], sym=True), [v])[0])
    assert np.abs(y_sym - y_full).max() < 1e-12 * np.abs(y_full).max()


def test_planar_assembly_3d_matches_blocked():
    """The 3D planar batched-GEMM assembly route (_elmat_planar, round 4)
    equals the blocked-W0 route for both full and SymHess states, and
    MFEM_AD_TPU_PLANAR_ASM=0 restores the blocked route."""
    import os

    from mfem_ad_tpu.ad import NeoHookeanEnergy

    m = mesh.make_cartesian_3d(3, 3, 3)
    fes = fespace.FESpace(m, order=1, vdim=3)
    intg = ADBlockIntegrator(
        NeoHookeanEnergy(3, 1.0, 1.0), [fes], [ADEval.GRAD | ADEval.VECTOR]
    )
    assert "0_0" in intg.tables["W0p"]  # planar factor built (nq <= 32)
    rng = np.random.default_rng(5)
    u = jnp.asarray(0.02 * rng.standard_normal(fes.ndof))
    Hq = intg.hess_state([u])
    sh = intg.hess_state([u], sym=True)
    os.environ["MFEM_AD_TPU_PLANAR_ASM"] = "0"
    try:
        A_ref = np.asarray(intg.element_matrices(Hq, 0, 0))
    finally:
        del os.environ["MFEM_AD_TPU_PLANAR_ASM"]
    A_pl = np.asarray(intg.element_matrices(Hq, 0, 0))
    A_ps = np.asarray(intg.element_matrices(sh, 0, 0))
    scale = np.abs(A_ref).max()
    assert np.abs(A_pl - A_ref).max() < 1e-9 * scale
    assert np.abs(A_ps - A_ref).max() < 1e-9 * scale


def test_symhess_block_system_newton_state():
    """forms.grad_state_raw packs by default; grad_mult/diag/assemble_dense
    agree with the unpacked policy on the ex4-style saddle form."""
    import os

    pb = obstacle.build(order=2, ref_levels=0)
    rng = np.random.default_rng(3)
    x = jnp.asarray(0.05 * rng.standard_normal(pb.form.ndof))
    v = jnp.asarray(rng.standard_normal(pb.form.ndof))
    fields = {
        "alpha": jnp.asarray(2.0),
        "latent_k0": jnp.asarray(
            0.1 * rng.standard_normal(pb.latent_space.ndof)
        ),
    }
    st = pb.form.grad_state(x, fields)
    assert isinstance(st[0], SymHess)
    y_sym = np.asarray(pb.form.grad_mult(st, v))
    d_sym = np.asarray(pb.form.grad_diag(st))
    A_sym = pb.form.assemble_dense(st)

    os.environ["MFEM_AD_TPU_SYM_STATE"] = "0"
    try:
        pb2 = obstacle.build(order=2, ref_levels=0)
        st2 = pb2.form.grad_state(x, fields)
        assert not isinstance(st2[0], SymHess)
        y_full = np.asarray(pb2.form.grad_mult(st2, v))
        d_full = np.asarray(pb2.form.grad_diag(st2))
        A_full = pb2.form.assemble_dense(st2)
    finally:
        del os.environ["MFEM_AD_TPU_SYM_STATE"]

    scale = np.abs(y_full).max()
    assert np.abs(y_sym - y_full).max() < 1e-11 * max(scale, 1.0)
    assert np.allclose(d_sym, d_full, atol=1e-11 * max(scale, 1.0))
    assert np.abs(A_sym - A_full).max() < 1e-11 * max(scale, 1.0)
