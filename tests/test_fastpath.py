"""Gather-free fast paths vs the generic edof gather/scatter.

The structured slice/pad paths (integrator._fast_gather/_fast_scatter)
must agree exactly with the generic path for every space kind, including
vector-valued L2 spaces that no solve currently exercises."""

import numpy as np
import pytest

import jax.numpy as jnp

from mfem_ad_tpu import mesh as M
from mfem_ad_tpu.ad import MassEnergy
from mfem_ad_tpu.adeval import ADEval
from mfem_ad_tpu.fespace import H1, FESpace, L2
from mfem_ad_tpu.integrator import ADBlockIntegrator


@pytest.mark.parametrize(
    "order,fe_type,vdim,dim",
    [
        (1, "h1", 1, 2),
        (2, "h1", 1, 2),
        (3, "h1", 2, 2),
        (1, "h1", 3, 3),
        (2, "h1", 1, 3),
        (0, "l2", 1, 2),
        (1, "l2", 2, 2),
        (1, "l2", 3, 3),
        # structured TRIANGLE meshes: grouped 2-orientation slice paths
        (1, "h1", 1, "tri"),
        (2, "h1", 1, "tri"),
        (2, "h1", 2, "tri"),
        (3, "h1", 1, "tri"),
    ],
)
def test_fast_gather_scatter_matches_generic(order, fe_type, vdim, dim):
    from mfem_ad_tpu.quadrature import TRIANGLE

    m = (
        M.make_cartesian_2d(3, 2, TRIANGLE)
        if dim == "tri"
        else M.make_cartesian_2d(3, 2)
        if dim == 2
        else M.make_cartesian_3d(2, 3, 2)
    )
    sp = FESpace(m, max(order, 1) if fe_type == "h1" else order,
                 L2 if fe_type == "l2" else H1, vdim=vdim)
    intg = ADBlockIntegrator(
        MassEnergy(vdim), [sp], [ADEval.VALUE | (ADEval.VECTOR if vdim > 1
                                                 else ADEval(0))]
    )
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(sp.ndof))
    g_fast = np.asarray(intg.gather(0, u, fast=True))
    g_gen = np.asarray(intg.gather(0, u, fast=False))
    assert np.array_equal(g_fast, g_gen)

    re = jnp.asarray(rng.standard_normal(g_fast.shape))
    s_fast = np.asarray(intg.scatter(0, re, fast=True))
    s_gen = np.asarray(intg.scatter(0, re, fast=False))
    assert np.allclose(s_fast, s_gen, atol=1e-14)

    # adjointness: <gather(u), re> == <u, scatter(re)>
    lhs = float(jnp.sum(jnp.asarray(g_fast) * re))
    rhs = float(jnp.dot(u, jnp.asarray(s_fast)))
    assert np.isclose(lhs, rhs, rtol=1e-12)
