"""Pallas ops: fused element-Jacobian kernel vs the XLA assembly path
(interpret mode on CPU; the TPU-compiled path is exercised by bench runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfem_ad_tpu import mesh as M
from mfem_ad_tpu.ad import ADFunction, LinearElasticityEnergy, NeoHookeanEnergy
from mfem_ad_tpu.adeval import ADEval
from mfem_ad_tpu.fespace import FESpace
from mfem_ad_tpu.integrator import ADBlockIntegrator
from mfem_ad_tpu.ops.fused_jacobian import (
    element_jacobian_via_pallas,
    supports_fused,
)


def _check(intg, u, block=16):
    A_ref = np.asarray(intg.element_matrices(intg.hess_state([u]), 0, 0))
    A_pl = np.asarray(
        element_jacobian_via_pallas(intg, [u], interpret=True, block=block)
    )
    np.testing.assert_allclose(A_pl, A_ref, atol=1e-10 * max(1, np.abs(A_ref).max()))


def test_fused_jacobian_elasticity():
    m = M.make_cartesian_2d(4, 4)
    fes = FESpace(m, 1, vdim=2)
    intg = ADBlockIntegrator(
        LinearElasticityEnergy(2, 1.0, 1.0), [fes],
        [ADEval.GRAD | ADEval.VECTOR],
    )
    assert supports_fused(intg)
    rng = np.random.default_rng(0)
    _check(intg, jnp.asarray(rng.standard_normal(fes.ndof)))


def test_fused_jacobian_neohookean_padded():
    m = M.make_cartesian_2d(3, 3)  # 9 elements: exercises block padding
    fes = FESpace(m, 1, vdim=2)
    intg = ADBlockIntegrator(
        NeoHookeanEnergy(2, 1.0, 1.0), [fes], [ADEval.GRAD | ADEval.VECTOR]
    )
    rng = np.random.default_rng(1)
    _check(intg, jnp.asarray(0.02 * rng.standard_normal(fes.ndof)), block=4)


def test_fused_jacobian_poisson_p2():
    m = M.make_cartesian_2d(4, 4)
    fes = FESpace(m, 2)
    from mfem_ad_tpu.ad import DiffusionEnergy

    intg = ADBlockIntegrator(DiffusionEnergy(2), [fes], [ADEval.GRAD])
    assert supports_fused(intg)
    rng = np.random.default_rng(2)
    _check(intg, jnp.asarray(rng.standard_normal(fes.ndof)))


def test_supports_fused_rejects_unstructured():
    from mfem_ad_tpu.quadrature import TRIANGLE

    m = M.make_cartesian_2d(4, 4, TRIANGLE)
    fes = FESpace(m, 2)
    from mfem_ad_tpu.ad import DiffusionEnergy

    intg = ADBlockIntegrator(DiffusionEnergy(2), [fes], [ADEval.GRAD])
    # triangle split meshes have two element orientations -> B not shared
    assert not supports_fused(intg)


def test_element_jacobians_router_matches_two_stage():
    """integrator.element_jacobians (the auto-router) must equal the
    explicit hess_state + element_matrices composition (CPU: XLA route)."""
    m = M.make_cartesian_2d(4, 4)
    fes = FESpace(m, 1, vdim=2)
    intg = ADBlockIntegrator(
        NeoHookeanEnergy(2, 1.0, 1.0), [fes], [ADEval.GRAD | ADEval.VECTOR]
    )
    rng = np.random.default_rng(3)
    u = jnp.asarray(0.02 * rng.standard_normal(fes.ndof))
    A_router = np.asarray(intg.element_jacobians([u]))
    A_ref = np.asarray(intg.element_matrices(intg.hess_state([u]), 0, 0))
    np.testing.assert_allclose(A_router, A_ref, rtol=0, atol=1e-12)
