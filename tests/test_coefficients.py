"""Coefficient adapters (reference tools.hpp:6-33,200-226),
DifferentiableCoefficient (ad_native.hpp:267-323), and QSpaceToFESpace
(tools.hpp:156-177)."""

import numpy as np

import jax.numpy as jnp

from mfem_ad_tpu import mesh as M
from mfem_ad_tpu.coefficients import (
    BooleanCoefficient,
    DifferentiableCoefficient,
    FunctionCoefficient,
    GridFunctionValueCoefficient,
    MappedGridFunctionCoefficient,
    VectorGradientGridFunction,
    VectorNormCoefficient,
    qp_context,
)
from mfem_ad_tpu.fespace import FESpace, qspace_to_fespace
from mfem_ad_tpu.quadrature import get_rule


def _setup(order=2):
    m = M.make_cartesian_2d(3, 3)
    sp = FESpace(m, order)
    ir = get_rule(m.geom, 2 * order)
    ctx = qp_context(m, ir)
    return m, sp, ir, ctx


def test_gridfunction_value_coefficient_exact():
    m, sp, ir, ctx = _setup()
    u = sp.project(lambda x: x[0] ** 2 + 2 * x[1])  # in the p=2 space
    vals = GridFunctionValueCoefficient(sp, u).eval_qp(ctx)
    exact = ctx.xq[..., 0] ** 2 + 2 * ctx.xq[..., 1]
    assert np.allclose(vals[..., 0], exact, atol=1e-12)


def test_mapped_gridfunction_coefficient():
    m, sp, ir, ctx = _setup()
    u = sp.project(lambda x: x[0])
    vals = MappedGridFunctionCoefficient(sp, u, lambda v: v * v).eval_qp(ctx)
    assert np.allclose(vals[..., 0], ctx.xq[..., 0] ** 2, atol=1e-12)


def test_vector_gradient_and_norm():
    m, sp, ir, ctx = _setup()
    vsp = FESpace(m, 2, vdim=2)
    # u = (x^2, x*y): grad = [[2x, 0], [y, x]] row-major flattening
    u = np.concatenate(
        [
            sp.project(lambda x: x[0] ** 2),
            sp.project(lambda x: x[0] * x[1]),
        ]
    )
    g = VectorGradientGridFunction(vsp, u).eval_qp(ctx)
    x, y = ctx.xq[..., 0], ctx.xq[..., 1]
    assert np.allclose(g[..., 0], 2 * x, atol=1e-10)
    assert np.allclose(g[..., 1], 0.0, atol=1e-10)
    assert np.allclose(g[..., 2], y, atol=1e-10)
    assert np.allclose(g[..., 3], x, atol=1e-10)

    n = VectorNormCoefficient(
        FunctionCoefficient(lambda x: np.array([3.0 * x[0], 4.0 * x[0]]), 2)
    ).eval_qp(ctx)
    assert np.allclose(n[..., 0], 5.0 * x, atol=1e-12)


def test_boolean_coefficient():
    m, sp, ir, ctx = _setup()
    b = BooleanCoefficient(
        FunctionCoefficient(lambda x: x[0]), lambda v: v > 0.5
    ).eval_qp(ctx)
    assert set(np.unique(b)) <= {0.0, 1.0}
    assert np.array_equal(b[..., 0], (ctx.xq[..., 0] > 0.5).astype(float))


def test_differentiable_coefficient_mirror_map():
    """ex4.cpp:124-128: visualize u = dE*(psi) via DifferentiableCoefficient
    gradient of the FermiDirac entropy."""
    from mfem_ad_tpu.pg import FermiDiracEntropy

    m, sp, ir, ctx = _setup()
    psi = sp.project(lambda x: 4.0 * (x[0] - 0.5))
    ent = FermiDiracEntropy(0.0, 0.5)
    dc = DifferentiableCoefficient(
        ent, [GridFunctionValueCoefficient(sp, psi)]
    )
    val = dc.eval_qp(ctx)
    grad = dc.gradient().eval_qp(ctx)
    hess = dc.hessian().eval_qp(ctx)
    p = 4.0 * (ctx.xq[..., 0] - 0.5)
    sig = 1 / (1 + np.exp(-0.5 * p))
    assert np.allclose(val[..., 0], np.logaddexp(0, 0.5 * p), atol=1e-10)
    assert np.allclose(grad[..., 0], 0.5 * sig, atol=1e-10)
    assert np.allclose(hess[..., 0], 0.25 * sig * (1 - sig), atol=1e-10)
    assert grad.min() >= 0.0 and grad.max() <= 0.5  # mirror map in bounds


def test_qspace_to_fespace_roundtrip():
    m, sp, ir, ctx = _setup()
    vals = (ctx.xq[..., 0] + 3 * ctx.xq[..., 1]) ** 2  # degree-2 data
    qsp, transfer = qspace_to_fespace(m, ir)
    d = transfer(vals)
    # evaluating the L2 fit back at the qps reproduces the data
    phi = qsp.elem.eval(ir.points)
    back = np.einsum("qd,ed->eq", phi, d[np.asarray(qsp.edof)])
    assert np.allclose(back, vals, atol=1e-10)
