"""Mesh, quadrature, basis, and FE-space structural tests."""

import numpy as np
import pytest

from mfem_ad_tpu import basis, fespace, geometry, mesh, quadrature
from mfem_ad_tpu.quadrature import CUBE, SQUARE, TRIANGLE


# ---------------------------------------------------------------------------
# quadrature
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("geom", [SQUARE, TRIANGLE, CUBE])
@pytest.mark.parametrize("order", [1, 2, 3, 5, 8])
def test_quadrature_polynomial_exactness(geom, order):
    ir = quadrature.get_rule(geom, order)
    dim = quadrature.GEOM_DIM[geom]
    rng = np.random.default_rng(42)
    # random monomial of total degree <= order
    for _ in range(5):
        while True:
            exps = rng.integers(0, order + 1, size=dim)
            if exps.sum() <= order:
                break
        vals = np.prod(ir.points**exps, axis=1)
        got = np.dot(ir.weights, vals)
        expect = _monomial_integral(geom, exps)
        assert np.isclose(got, expect, rtol=1e-12, atol=1e-14), (exps, got, expect)


def _monomial_integral(geom, exps):
    if geom in (SQUARE, CUBE):
        return np.prod([1.0 / (e + 1) for e in exps])
    # triangle: int x^a y^b = a! b! / (a+b+2)!
    from math import factorial

    a, b = int(exps[0]), int(exps[1])
    return factorial(a) * factorial(b) / factorial(a + b + 2)


# ---------------------------------------------------------------------------
# basis
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("geom", [SQUARE, TRIANGLE, CUBE])
@pytest.mark.parametrize("p", [1, 2, 3, 4])
def test_basis_delta_and_partition_of_unity(geom, p):
    el = basis.ref_element(geom, p)
    V = el.eval(el.nodes)
    assert np.allclose(V, np.eye(el.ndof), atol=1e-9)
    ir = quadrature.get_rule(geom, 2 * p)
    vals = el.eval(ir.points)
    assert np.allclose(vals.sum(axis=1), 1.0, atol=1e-10)
    grads = el.grad(ir.points)
    assert np.allclose(grads.sum(axis=1), 0.0, atol=1e-9)


@pytest.mark.parametrize("geom", [SQUARE, TRIANGLE])
@pytest.mark.parametrize("p", [2, 3])
def test_basis_reproduces_polynomials(geom, p):
    el = basis.ref_element(geom, p)
    ir = quadrature.get_rule(geom, 2 * p)

    def f(x):
        return x[..., 0] ** p + (x[..., 0] * x[..., 1]) ** (p // 2) + 2.0

    coeffs = f(el.nodes)
    vals = el.eval(ir.points) @ coeffs
    assert np.allclose(vals, f(ir.points), atol=1e-10)


# ---------------------------------------------------------------------------
# mesh
# ---------------------------------------------------------------------------


def test_cartesian_2d_counts_and_area():
    m = mesh.make_cartesian_2d(3, 4)
    assert m.num_elements == 12
    assert m.num_vertices == 20
    ir = quadrature.get_rule(SQUARE, 2)
    gf = geometry.geom_factors(m, ir)
    assert np.isclose(gf.w.sum(), 1.0)
    assert m.max_bdr_attribute() == 4


def test_refine_preserves_area_2d():
    for geom in (SQUARE, TRIANGLE):
        m = mesh.make_cartesian_2d(2, 2, geom, sx=2.0, sy=3.0).uniform_refine(2)
        ir = quadrature.get_rule(geom, 2)
        gf = geometry.geom_factors(m, ir)
        assert np.isclose(gf.w.sum(), 6.0)
        # boundary length: each side split consistently
        assert m.bdr_elements.shape[0] == (2 * 4) * (2 + 2) * (
            1 if geom == SQUARE else 1
        )


def test_refine_preserves_volume_3d():
    m = mesh.make_cartesian_3d(2, 2, 2).uniform_refine(1)
    assert m.num_elements == 64
    ir = quadrature.get_rule(CUBE, 2)
    gf = geometry.geom_factors(m, ir)
    assert np.isclose(gf.w.sum(), 1.0)
    assert m.bdr_elements.shape[0] == 6 * 4 * 4


def test_mfem_mesh_reader():
    m = mesh.read_mfem_mesh("/root/reference/data/sloped_rectangle.mesh")
    assert m.num_elements == 3
    ir = quadrature.get_rule(m.geom, 2)
    gf = geometry.geom_factors(m, ir)
    assert gf.w.sum() > 0


# ---------------------------------------------------------------------------
# fespace
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("geom", [SQUARE, TRIANGLE])
@pytest.mark.parametrize("p", [1, 2, 3])
def test_h1_dof_counts_2d(geom, p):
    nx = ny = 3
    m = mesh.make_cartesian_2d(nx, ny, geom)
    fes = fespace.FESpace(m, p)
    nv = (nx + 1) * (ny + 1)
    if geom == SQUARE:
        nedge = nx * (ny + 1) + ny * (nx + 1)
        nint = nx * ny * (p - 1) ** 2
    else:
        nedge = nx * (ny + 1) + ny * (nx + 1) + nx * ny
        nint = 2 * nx * ny * ((p - 1) * (p - 2) // 2)
    assert fes.ndof_scalar == nv + nedge * (p - 1) + nint


@pytest.mark.parametrize("geom", [SQUARE, TRIANGLE, CUBE])
@pytest.mark.parametrize("p", [1, 2, 3])
def test_h1_continuity_via_projection(geom, p):
    """Projecting a degree-p polynomial must reproduce it exactly at qps —
    exercises edge/face orientation handling in the dof numbering."""
    if geom == CUBE:
        m = mesh.make_cartesian_3d(2, 2, 2)
    else:
        m = mesh.make_cartesian_2d(3, 2, geom).uniform_refine(1)
    fes = fespace.FESpace(m, p)

    def f(x):
        return (x[0] + 0.7 * x[1]) ** p + (x[-1] if len(x) > 2 else 0.0)

    u = fes.project(f)
    ir = quadrature.get_rule(m.geom, 2 * p)
    gf = geometry.geom_factors(m, ir)
    phi = fes.elem.eval(ir.points)
    vals = np.einsum("qd,ed->eq", phi, u[fes.edof])
    exact = np.array([f(x) for x in gf.xq.reshape(-1, m.dim)]).reshape(
        vals.shape
    )
    assert np.allclose(vals, exact, atol=1e-9)


def test_l2_space_discontinuous():
    m = mesh.make_cartesian_2d(2, 2)
    fes = fespace.FESpace(m, 1, fespace.L2)
    assert fes.ndof_scalar == 4 * 4
    assert len(np.unique(fes.edof)) == fes.ndof_scalar


def test_boundary_dofs_by_attribute():
    m = mesh.make_cartesian_2d(4, 4)
    fes = fespace.FESpace(m, 2)
    # bottom only (attr 1)
    ids = fes.boundary_dofs([1, 0, 0, 0])
    coords = fes.node_coords[ids]
    assert np.allclose(coords[:, 1], 0.0)
    assert len(ids) == 2 * 4 + 1
    all_ids = fes.boundary_dofs()
    assert len(all_ids) == 4 * (2 * 4)  # 16 bdr edges p=2: 32 nodes


def test_vector_space_essential_mask():
    m = mesh.make_cartesian_2d(2, 2)
    fes = fespace.FESpace(m, 1, vdim=2)
    mask = fes.essential_mask([1, 0, 0, 0])
    assert mask.sum() == 2 * 3  # 3 bottom nodes x 2 components
    mask0 = fes.essential_mask([1, 0, 0, 0], components=[0])
    assert mask0.sum() == 3


def test_curl_mode_2d_rotated_gradient():
    """ADEval.CURL (2D scalar FE): curl psi = rotated grad psi, so the
    1/2|curl psi|^2 energy must assemble identically to 1/2|grad psi|^2
    (rotation preserves the norm) — residuals AND element Jacobians.

    Superset of the reference, where CURL is declared but unusable
    (VECFE not-yet-implemented, _ad_intg.hpp:49)."""
    import jax.numpy as jnp

    from mfem_ad_tpu.ad import DiffusionEnergy, MassEnergy
    from mfem_ad_tpu.adeval import ADEval, build_B, shapedim
    from mfem_ad_tpu.integrator import ADBlockIntegrator

    m = mesh.make_cartesian_2d(3, 2)
    sp = fespace.FESpace(m, 2)
    assert shapedim(ADEval.CURL, 2) == 2

    i_curl = ADBlockIntegrator(MassEnergy(2), [sp], [ADEval.CURL])
    i_grad = ADBlockIntegrator(DiffusionEnergy(2), [sp], [ADEval.GRAD])

    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal(sp.ndof))
    (r_c,) = i_curl.residual([u])
    (r_g,) = i_grad.residual([u])
    assert np.allclose(np.asarray(r_c), np.asarray(r_g), atol=1e-12)

    A_c = np.asarray(i_curl.element_jacobians([u]))
    A_g = np.asarray(i_grad.element_jacobians([u]))
    assert np.allclose(A_c, A_g, atol=1e-12)

    # pointwise orthogonality: curl psi . grad psi == 0 at every qp
    xq_c = np.asarray(i_curl.x_qp([u]))
    xq_g = np.asarray(i_grad.x_qp([u]))
    assert np.allclose((xq_c * xq_g).sum(-1), 0.0, atol=1e-12)

    # 3D stays a loud error (parity with the reference's VECFE gap)
    m3 = mesh.make_cartesian_3d(2, 2, 2)
    sp3 = fespace.FESpace(m3, 1)
    with pytest.raises(NotImplementedError):
        ADBlockIntegrator(MassEnergy(3), [sp3], [ADEval.CURL])


def test_boundary_dofs_empty_attr_mask():
    """An attr_mask selecting no boundary faces must yield an empty dof
    array, not crash (3D structured-lattice path regression: empty
    np.concatenate)."""
    m3 = mesh.make_cartesian_3d(2, 2, 2)
    sp3 = fespace.FESpace(m3, 2)
    out = sp3.boundary_dofs(np.zeros(6))
    assert out.shape == (0,)
    m2 = mesh.make_cartesian_2d(2, 2)
    sp2 = fespace.FESpace(m2, 2)
    assert sp2.boundary_dofs(np.zeros(4)).shape == (0,)
