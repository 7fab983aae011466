"""Tetrahedral (3D simplex) elements end-to-end (VERDICT r4 #3).

The reference consumes arbitrary MFEM meshes (ex1.cpp:35) and MFEM
supports tets natively; here the tet element is built from scratch:
collapsed Gauss-Jacobi quadrature, 3D Dubiner (PKD) lattice Lagrange
basis, Kuhn-split Cartesian tet meshes, Bey red refinement, topological
H1 dof numbering with triangular-face orientation canonicalization, and
the affine pullback assembly route (tets are affine)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from mfem_ad_tpu import mesh as M
from mfem_ad_tpu.basis import ref_element
from mfem_ad_tpu.fespace import FESpace, H1, L2
from mfem_ad_tpu.geometry import geom_factors
from mfem_ad_tpu.quadrature import TETRAHEDRON, get_rule


def test_tet_quadrature_exactness():
    """Collapsed GL x GJ(1,0) x GJ(2,0) rule integrates total degree
    `order` monomials exactly: int x^a y^b z^c = a!b!c!/(a+b+c+3)!."""
    for order in range(0, 7):
        r = get_rule(TETRAHEDRON, order)
        assert abs(r.weights.sum() - 1 / 6) < 1e-14
        for a in range(order + 1):
            for b in range(order + 1 - a):
                c = order - a - b
                val = np.sum(
                    r.weights * r.points[:, 0] ** a * r.points[:, 1] ** b
                    * r.points[:, 2] ** c
                )
                exact = (
                    math.factorial(a) * math.factorial(b) * math.factorial(c)
                    / math.factorial(a + b + c + 3)
                )
                assert abs(val - exact) < 1e-13, (order, (a, b, c))


@pytest.mark.parametrize("p", [1, 2, 3, 4])
def test_tet_basis_lagrange_and_gradients(p):
    fe = ref_element(TETRAHEDRON, p)
    assert fe.ndof == (p + 1) * (p + 2) * (p + 3) // 6
    V = fe.eval(fe.nodes)
    assert np.allclose(V, np.eye(fe.ndof), atol=1e-9)
    rng = np.random.default_rng(p)
    pts = rng.dirichlet([1.0] * 4, size=20)[:, :3]
    assert np.allclose(fe.eval(pts).sum(axis=1), 1.0, atol=1e-12)
    G = fe.grad(pts)
    assert np.allclose(G.sum(axis=1), 0.0, atol=1e-10)
    h = 1e-6
    for d in range(3):
        dp = pts.copy()
        dp[:, d] += h
        dm = pts.copy()
        dm[:, d] -= h
        fd = (fe.eval(dp) - fe.eval(dm)) / (2 * h)
        assert np.abs(fd - G[:, :, d]).max() < 1e-6
    # gradients stay polynomial-exact at collapsed-coordinate nodes
    cen = np.array([0.25, 0.25, 0.25])
    g0 = fe.grad(fe.nodes)
    gi = fe.grad((1 - 1e-7) * fe.nodes + 1e-7 * cen)
    assert np.isfinite(g0).all()
    assert np.abs(g0 - gi).max() < 1e-4 * max(1.0, np.abs(g0).max())


def test_tet_mesh_kuhn_split_and_refine():
    m = M.make_cartesian_3d(2, 2, 2, geom=TETRAHEDRON)
    assert m.num_elements == 48  # 6 tets per cube
    # positive Jacobians + exact volume (geom_factors raises on inversion)
    gf = geom_factors(m, get_rule(TETRAHEDRON, 2))
    assert abs(gf.w.sum() - 1.0) < 1e-12
    # Bey red refinement: 8 children each, conforming, volume preserved
    m2 = m.uniform_refine(1)
    assert m2.num_elements == 8 * 48
    gf2 = geom_factors(m2, get_rule(TETRAHEDRON, 2))
    assert abs(gf2.w.sum() - 1.0) < 1e-12
    assert m2.bdr_elements.shape == (4 * m.bdr_elements.shape[0], 3)


@pytest.mark.parametrize("p", [1, 2, 3, 4])
def test_tet_h1_conformity(p):
    """node_coords[edof] must equal the mapped lattice nodes — proves the
    orientation-canonical shared-dof numbering is geometrically
    consistent across elements (the MFEM-internal invariant)."""
    m = M.make_cartesian_3d(2, 2, 2, geom=TETRAHEDRON)
    fes = FESpace(m, p)
    X = fes._geometry_node_coords()
    assert np.abs(X - fes.node_coords[fes.edof.astype(np.int64)]).max() < 1e-12
    assert np.unique(fes.edof).size == fes.ndof_scalar
    # the union of tet lattices over the Kuhn split fills the p-refined
    # tensor grid exactly
    assert fes.ndof_scalar == (2 * p + 1) ** 3
    bd = fes.boundary_dofs()
    on = (
        (np.abs(fes.node_coords) < 1e-12)
        | (np.abs(fes.node_coords - 1) < 1e-12)
    ).any(axis=1)
    assert set(bd) == set(np.where(on)[0])


def _solve_tet_poisson(n, p):
    from mfem_ad_tpu.ad import DiffusionEnergy
    from mfem_ad_tpu.adeval import ADEval
    from mfem_ad_tpu.forms import LinearForm, NonlinearForm
    from mfem_ad_tpu.norms import l2_error
    from mfem_ad_tpu.solvers import NewtonOptions, newton

    def exact(x):
        return (np.sin(np.pi * x[0]) * np.sin(np.pi * x[1])
                * np.sin(np.pi * x[2]))

    def load(x):
        return 3 * np.pi**2 * exact(x)

    m = M.make_cartesian_3d(n, n, n, geom=TETRAHEDRON)
    fes = FESpace(m, p)
    nlf = NonlinearForm(fes)
    nlf.add_ad_integrator(DiffusionEnergy(3), ADEval.GRAD)
    nlf.set_essential_bc([np.ones(m.max_bdr_attribute())])
    assert nlf.integrators[0].pullback  # affine route fires on tets
    b = LinearForm(fes, load).assemble()
    b[np.asarray(fes.boundary_dofs())] = 0.0
    x0 = jnp.asarray(fes.project_bdr(np.zeros(fes.ndof), exact))
    res = newton(
        nlf, x0, b=jnp.asarray(b),
        opts=NewtonOptions(abs_tol=1e-12, max_iter=3, lin_solver="cg",
                           lin_tol=1e-14, preconditioner="jacobi"),
    )
    assert res.converged
    return l2_error(fes, np.asarray(res.x), exact)


@pytest.mark.parametrize(
    "p,ns,min_rate", [(1, (4, 8), 1.7), (2, (2, 4), 2.6), (3, (2, 4), 3.5)]
)
def test_tet_poisson_mms_rate(p, ns, min_rate):
    """L2 convergence at rate p+1 on tet meshes, p = 1..3 (the reference
    inherits this from MFEM for any mesh, ex1.cpp:35)."""
    e0 = _solve_tet_poisson(ns[0], p)
    e1 = _solve_tet_poisson(ns[1], p)
    rate = np.log2(e0 / e1)
    assert rate > min_rate, (p, e0, e1, rate)


def test_tet_elasticity_solve():
    """ex3 on a tet mesh (vector vdim=3, GRAD|VECTOR mode)."""
    from mfem_ad_tpu.models import elasticity

    res, pb = elasticity.solve(order=1, ref_levels=0, dim=3, geom="tet")
    assert res.converged
    assert pb.mesh.geom == TETRAHEDRON
    u = np.asarray(res.x)
    assert np.isfinite(u).all() and np.abs(u).max() > 0


def test_tet_obstacle_lvpp():
    """ex4's LVPP obstacle loop on a tet mesh (mixed H1 x L2 block
    spaces) — dense direct inner solves at this tiny size."""
    from mfem_ad_tpu.models import obstacle
    from mfem_ad_tpu.pg import PGSolver, PGStepSizeRule
    from mfem_ad_tpu.solvers import NewtonOptions

    pb = obstacle.build(order=1, ref_levels=1, n0=2, dim=3, geom="tet")
    assert pb.mesh.geom == TETRAHEDRON
    rule = PGStepSizeRule(PGStepSizeRule.EXP, 0.1, 1e4, 2.0, 1.0)
    solver = PGSolver(
        pb.form, rule, latent_block=1, latent_space=pb.latent_space,
        newton_opts=NewtonOptions(abs_tol=1e-9, max_iter=20,
                                  lin_solver="dense"),
        max_iter=40, tol=1e-6,
    )
    res = solver.solve(jnp.zeros(pb.form.ndof), pb.rhs)
    assert res.converged
    off = pb.form.offsets
    u = np.asarray(res.x[: off[1]])
    # bound holds weakly: pointwise overshoot is the O(h^2) interpolation
    # error of the saturated mirror map on the contact set (h = 0.25 here;
    # cf. test_pg.py::test_obstacle_lvpp_regression at h = 0.05 / 5e-3)
    assert u.min() > -1e-8 and u.max() < 0.5 + 0.06
    assert u.max() > 0.49  # constraint active (unconstrained max > 0.5)
    # the mirror map dE*(psi) = 0.5 sigmoid(0.5 psi) is in [0, 0.5] exactly
    psi = np.asarray(res.x[off[1]:])
    mirror = 0.5 / (1.0 + np.exp(-0.5 * psi))
    assert mirror.min() >= 0.0 and mirror.max() <= 0.5


def test_tet_l2_space_and_vtu(tmp_path):
    m = M.make_cartesian_3d(2, 2, 2, geom=TETRAHEDRON)
    sp = FESpace(m, 1, L2)
    assert sp.ndof == m.num_elements * 4
    from mfem_ad_tpu.utils.vtk import write_vtu

    h1 = FESpace(m, 2)
    u = h1.project(lambda x: x[0] + 2 * x[1])
    path = str(tmp_path / "tet.vtu")
    write_vtu(path, m, fields={"u": u}, spaces={"u": h1})
    txt = open(path).read()
    assert "10" in txt and "UnstructuredGrid" in txt


def test_tet_mfem_mesh_reader(tmp_path):
    """MFEM v1.0 geometry type 4 (TETRAHEDRON) round-trips through the
    reader (reference meshes are consumable, SURVEY §2.7)."""
    path = tmp_path / "one_tet.mesh"
    path.write_text(
        "MFEM mesh v1.0\n\ndimension\n3\n\nelements\n1\n1 4 0 1 2 3\n\n"
        "boundary\n4\n1 2 0 1 2\n1 2 0 1 3\n1 2 0 2 3\n1 2 1 2 3\n\n"
        "vertices\n4\n3\n0 0 0\n1 0 0\n0 1 0\n0 0 1\n"
    )
    m = M.read_mfem_mesh(str(path))
    assert m.geom == TETRAHEDRON and m.num_elements == 1
    gf = geom_factors(m, get_rule(TETRAHEDRON, 1))
    assert abs(gf.w.sum() - 1 / 6) < 1e-14
    fes = FESpace(m, 3)
    assert fes.ndof_scalar == 20
