"""HaloShardedForm (round 4, VERDICT r3 #2): distributed-dof assembly with
partition-interface-only exchange.  Every product must match the serial
form exactly (same strided-slice/dilated-pad arithmetic per shard), the
matvec HLO must contain collective-permutes but NO dof-sized all-reduce,
and Newton must run unchanged on the distributed vectors."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfem_ad_tpu.models import obstacle, poisson
from mfem_ad_tpu.parallel import HaloShardedForm, ShardedForm


@pytest.fixture(scope="module")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


def _roundtrip(hf, rng):
    u = rng.standard_normal(hf.form.ndof)
    ud = hf.to_dist(u)
    u2 = hf.from_dist(ud)
    assert np.allclose(u2, u)
    # owner-zero: the distributed vector has exactly ndof nonzero slots
    # available (ghosts zero), so vdot computes the canonical inner product
    v = rng.standard_normal(hf.form.ndof)
    vd = hf.to_dist(v)
    assert np.isclose(np.dot(ud, vd), np.dot(u, v))
    return u, ud


def test_halo_layout_roundtrip(eight_devices):
    pb = poisson.build(order=2, ref_levels=0, n0=8)
    hf = HaloShardedForm(pb.form)
    _roundtrip(hf, np.random.default_rng(0))


def test_halo_assembly_matches_serial(eight_devices):
    pb = poisson.build(order=2, ref_levels=0, n0=8)
    hf = HaloShardedForm(pb.form)
    rng = np.random.default_rng(1)
    u, ud = _roundtrip(hf, rng)
    uj, udj = jnp.asarray(u), hf.dist_array(u)

    r_serial = np.asarray(pb.form.mult(uj))
    r_halo = hf.from_dist(np.asarray(hf.mult(udj)))
    assert np.allclose(r_halo, r_serial, atol=1e-13)

    assert np.isclose(float(pb.form.energy(uj)), float(hf.energy(udj)),
                      atol=1e-10)

    st_s = pb.form.grad_state(uj)
    st_h = hf.grad_state(udj)
    v = rng.standard_normal(pb.form.ndof)
    y_serial = np.asarray(pb.form.grad_mult(st_s, jnp.asarray(v)))
    y_halo = hf.from_dist(np.asarray(hf.grad_mult(st_h, hf.dist_array(v))))
    assert np.allclose(y_halo, y_serial, atol=1e-13)

    d_serial = np.asarray(pb.form.grad_diag(st_s))
    d_halo = hf.from_dist(np.asarray(hf.grad_diag(st_h)))
    assert np.allclose(d_halo, d_serial, atol=1e-13)

    # O(surface) bytes: two interface planes per boundary per h1 space
    nbytes = hf.halo_bytes_per_matvec()
    sp = pb.form.spaces[0]
    NX = sp.grid[2][1]
    assert nbytes == 2 * 7 * NX * 8
    # scaling: refining the mesh once doubles the interface bytes but
    # quadruples ndof — the exchange is O(surface), not O(ndof)
    pb2 = poisson.build(order=2, ref_levels=1, n0=8)
    hf2 = HaloShardedForm(pb2.form)
    assert hf2.halo_bytes_per_matvec() < 2.1 * nbytes
    assert pb2.form.ndof > 3.5 * pb.form.ndof


def test_halo_mixed_block_system(eight_devices):
    """ex4-style H1 x L2 saddle form: the L2 latent is element-local
    (zero exchange), the H1 primal exchanges planes."""
    pb = obstacle.build(order=2, ref_levels=0, n0=8)
    hf = HaloShardedForm(pb.form)
    rng = np.random.default_rng(2)
    u = 0.1 * rng.standard_normal(pb.form.ndof)
    fields = {
        "alpha": jnp.asarray(2.0),
        "latent_k0": jnp.asarray(
            0.1 * rng.standard_normal(pb.latent_space.ndof)
        ),
    }
    uj, udj = jnp.asarray(u), hf.dist_array(u)
    r_serial = np.asarray(pb.form.mult(uj, fields))
    r_halo = hf.from_dist(np.asarray(hf.mult(udj, fields)))
    assert np.allclose(r_halo, r_serial, atol=1e-13)

    st_s = pb.form.grad_state(uj, fields)
    st_h = hf.grad_state(udj, fields)
    v = rng.standard_normal(pb.form.ndof)
    y_serial = np.asarray(pb.form.grad_mult(st_s, jnp.asarray(v)))
    y_halo = hf.from_dist(np.asarray(hf.grad_mult(st_h, hf.dist_array(v))))
    assert np.allclose(y_halo, y_serial, atol=1e-12)


def test_halo_matvec_hlo_has_no_dof_allreduce(eight_devices):
    """The compiled grad_mult must move data between shards ONLY via
    collective-permute (interface planes); any all-reduce present must be
    scalar-sized (none expected here), never dof-sized."""
    pb = poisson.build(order=2, ref_levels=0, n0=8)
    hf = HaloShardedForm(pb.form)
    rng = np.random.default_rng(3)
    u = rng.standard_normal(pb.form.ndof)
    ud = hf.dist_array(u)
    st = hf.grad_state(ud)

    fn = jax.jit(hf.grad_mult_raw)
    lowered = fn.lower(hf._tables(), hf.ess_mask, st, ud)
    hlo = lowered.compile().as_text()
    assert "collective-permute" in hlo
    for line in hlo.splitlines():
        if "all-reduce" in line and "f64[" in line:
            # any all-reduce must be scalar (f64[] or f64[1]);
            # a dof-sized one means the halo path regressed to psum
            assert "f64[]" in line or "f64[1]" in line, line


def test_halo_newton_matches_sharded(eight_devices):
    """Full Newton+Jacobi-CG on distributed vectors matches the replicated
    ShardedForm solve and the exact solution."""
    from mfem_ad_tpu.norms import l2_error
    from mfem_ad_tpu.solvers import NewtonOptions, newton

    pb = poisson.build(order=2, ref_levels=1, n0=8)
    hf = HaloShardedForm(pb.form)
    sf = ShardedForm(pb.form)
    opts = NewtonOptions(
        abs_tol=1e-10, max_iter=3, lin_solver="cg", lin_tol=1e-14,
        preconditioner="jacobi",
    )
    res_h = newton(hf, hf.dist_array(np.zeros(pb.form.ndof)),
                   b=hf.dist_array(np.asarray(pb.rhs)), opts=opts)
    res_s = newton(sf, jnp.zeros(pb.form.ndof), b=pb.rhs, opts=opts)
    assert res_h.converged and res_s.converged
    x_h = hf.from_dist(np.asarray(res_h.x))
    assert np.allclose(x_h, np.asarray(res_s.x), atol=1e-9)
    err = l2_error(pb.space, x_h, poisson.exact_fn)
    assert err < 5e-5  # p2 MMS error on the 16x16 mesh


def test_halo_triangle_mesh(eight_devices):
    """h1t (structured triangle) spaces band the same way — covers the
    two-orientation grouped gather under the halo exchange (ex5 meshes)."""
    from mfem_ad_tpu.models import gradient_obstacle

    pb = gradient_obstacle.build(order=2, ref_levels=1, n0=4)  # ny=8
    hf = HaloShardedForm(pb.form)
    rng = np.random.default_rng(4)
    u = 0.1 * rng.standard_normal(pb.form.ndof)
    fields = {
        "alpha": jnp.asarray(2.0),
        "latent_k0": jnp.asarray(
            0.1 * rng.standard_normal(pb.latent_space.ndof)
        ),
    }
    uj, udj = jnp.asarray(u), hf.dist_array(u)
    r_serial = np.asarray(pb.form.mult(uj, fields))
    r_halo = hf.from_dist(np.asarray(hf.mult(udj, fields)))
    assert np.allclose(r_halo, r_serial, atol=1e-12)
    st_s = pb.form.grad_state(uj, fields)
    st_h = hf.grad_state(udj, fields)
    v = rng.standard_normal(pb.form.ndof)
    y_serial = np.asarray(pb.form.grad_mult(st_s, jnp.asarray(v)))
    y_halo = hf.from_dist(np.asarray(hf.grad_mult(st_h, hf.dist_array(v))))
    assert np.allclose(y_halo, y_serial, atol=1e-12)


def test_halo_schur_direction_matches_serial(eight_devices):
    """The PRODUCTION Schur Newton direction (exact L2-latent elimination
    + Jacobi-CG on the condensed system) through HaloShardedForm matches
    the serial direction to machine precision (VERDICT r4 #2; reference
    flagship: distributed MUMPS, tools.hpp:128-154)."""
    from mfem_ad_tpu.models import obstacle
    from mfem_ad_tpu.solvers import _schur_solve_traced

    pb = obstacle.build(order=1, ref_levels=0, n0=16)
    form = pb.form
    hf = HaloShardedForm(form)
    rng = np.random.default_rng(0)
    x_c = jnp.asarray(0.1 * rng.standard_normal(form.ndof))
    lk = jnp.zeros(pb.latent_space.ndof)
    fields = {"alpha": jnp.asarray(1.0), "latent_k0": lk}

    r_s = form.mult(x_c, fields) - pb.rhs
    r_s = jnp.where(form.ess_mask, 0.0, r_s)
    st_s = form.grad_state(x_c, fields)
    dx_s = jax.jit(
        lambda t, e, s, r: _schur_solve_traced(form, t, e, s, r, 1e-12, 400)
    )(form._tables(), form.ess_mask, st_s, r_s)

    @jax.jit
    def halo_dir(tables, ess, x, b, latent_k):
        f2 = {"alpha": jnp.asarray(1.0), "latent_k0": latent_k}
        r = hf.mult_raw(tables, ess, x, f2) - b
        r = jnp.where(ess, 0.0, r)
        st = hf.grad_state_raw(tables, x, f2)
        return _schur_solve_traced(hf, tables, ess, st, r, 1e-12, 400)

    dx_d = halo_dir(hf._tables(), hf.ess_mask, hf.dist_array(np.asarray(x_c)),
                    hf.dist_array(np.asarray(pb.rhs)), lk)
    dx_c = hf.from_dist(np.asarray(dx_d))
    scale = max(1.0, np.abs(np.asarray(dx_s)).max())
    assert np.abs(dx_c - np.asarray(dx_s)).max() / scale < 1e-10

    # the whole production direction program must exchange data between
    # shards only via collective-permute + scalar reductions — never a
    # dof-sized all-reduce (extends the matvec HLO lock to the full
    # Schur Newton step)
    hlo = halo_dir.lower(
        hf._tables(), hf.ess_mask, hf.dist_array(np.asarray(x_c)),
        hf.dist_array(np.asarray(pb.rhs)), lk,
    ).compile().as_text()
    assert "collective-permute" in hlo
    import re

    for line in hlo.splitlines():
        m = re.search(r"= f64\[([\d,]*)\][^=]* all-reduce(?:-start)?\(",
                      line)
        if m:  # a DEFINED all-reduce: must be scalar-sized
            dims = m.group(1)
            assert dims in ("", "1"), line


def test_halo_schur_full_lvpp_solve(eight_devices):
    """A full LVPP outer iteration's inner Newton (lin_solver='schur')
    runs end-to-end on the halo form and matches the serial solve."""
    from mfem_ad_tpu.models import obstacle
    from mfem_ad_tpu.solvers import NewtonOptions, newton

    pb = obstacle.build(order=1, ref_levels=0, n0=16)
    hf = HaloShardedForm(pb.form)
    lk = jnp.zeros(pb.latent_space.ndof)
    fields = {"alpha": jnp.asarray(0.5), "latent_k0": lk}
    opts = NewtonOptions(abs_tol=1e-10, max_iter=20, lin_solver="schur",
                         lin_tol=1e-12, lin_maxiter=400)
    res_h = newton(hf, hf.dist_array(np.zeros(pb.form.ndof)),
                   b=hf.dist_array(np.asarray(pb.rhs)), fields=fields,
                   opts=opts)
    res_s = newton(pb.form, jnp.zeros(pb.form.ndof), b=pb.rhs,
                   fields=fields, opts=opts)
    assert res_h.converged and res_s.converged
    x_h = hf.from_dist(np.asarray(res_h.x))
    assert np.allclose(x_h, np.asarray(res_s.x), atol=1e-8)


def test_halo_full_pg_solver_matches_serial(eight_devices):
    """The FULL outer LVPP loop (PGSolver) runs on HaloShardedForm —
    distributed dof vectors end-to-end, latent extracted through the
    canonical converter once per outer iteration — and reproduces the
    serial PG trajectory."""
    from mfem_ad_tpu.models import obstacle
    from mfem_ad_tpu.pg import PGSolver, PGStepSizeRule
    from mfem_ad_tpu.solvers import NewtonOptions

    pb = obstacle.build(order=1, ref_levels=0, n0=16)
    rule = PGStepSizeRule(PGStepSizeRule.EXP, 0.1, 1e4, 2.0, 1.0)
    nopts = NewtonOptions(abs_tol=1e-9, max_iter=20, lin_solver="schur",
                          lin_tol=1e-12, lin_maxiter=400)

    def solve(form, x0, rhs):
        return PGSolver(
            form, rule, latent_block=1, latent_space=pb.latent_space,
            newton_opts=nopts, max_iter=30, tol=1e-7,
        ).solve(x0, rhs)

    res_s = solve(pb.form, jnp.zeros(pb.form.ndof), pb.rhs)
    hf = HaloShardedForm(pb.form)
    res_h = solve(hf, hf.dist_array(np.zeros(pb.form.ndof)),
                  hf.dist_array(np.asarray(pb.rhs)))
    assert res_s.converged and res_h.converged
    assert res_s.iterations == res_h.iterations
    x_h = hf.from_dist(np.asarray(res_h.x))
    assert np.allclose(x_h, np.asarray(res_s.x), atol=1e-7)
    assert np.isclose(res_h.lambda_diff, res_s.lambda_diff,
                      rtol=1e-3, atol=1e-12)
