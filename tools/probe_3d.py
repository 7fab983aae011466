"""On-chip stage breakdown of the p1/3D element-Jacobian pass (round 4,
VERDICT r3 #4).  All stages run INSIDE one jit (like the bench), timed by
a differenced scan.  Stages:

  resid     full residual pass (reference point, ~117M elem/s r3)
  ad_only   jacfwd Hessian computed, reduced by a plane-sum (no relayout,
            no GEMM) — isolates the AD-stage VPU cost
  full      hess_state + element_matrices (the benched route, 8.8M r3)
  plane     hess_state + per-plane batched GEMM + reduce (new route that
            contracts in the AD output's natural plane-major layout)

Usage: python tools/probe_3d.py [order] [dim] [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timed_scan(build_fn, tables, u, reps0=3, reps1=13):
    def make(reps):
        @jax.jit
        def run(tables, u):
            def body(acc, c):
                return acc + build_fn(tables, u * c), None

            cs = 1.0 + jnp.arange(reps, dtype=jnp.float32) * 1e-6
            out, _ = jax.lax.scan(body, jnp.float32(0.0), cs)
            return out

        return run

    r0, r1 = make(reps0), make(reps1)

    def t(run):
        float(run(tables, u))  # fetch the scalar: block_until_ready is
        ts = []                # unreliable on the axon tunnel (see bench)
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(tables, u))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max((t(r1) - t(r0)) / (reps1 - reps0), 1e-12)


def main():
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    m, fes, intg, u = bench._build(order, dim, n)
    tables = intg.tables
    ne = m.num_elements
    nin = intg.n_input
    print(f"p{order}/{dim}D n={n} ne={ne} nq={intg.nq} n_input={nin}",
          flush=True)

    def resid(tables, uu):
        return jnp.sum(intg.residual([uu], tables=tables)[0])

    def ad_only(tables, uu):
        H = intg.hess_state([uu], tables=tables)  # [ne, nq, n, n]
        # plane-sum: forces every Hessian entry, costs one [ne, nq]
        # reduction per plane, no relayout of the batch dims
        return jnp.sum(H)

    def full(tables, uu):
        H = intg.hess_state([uu], tables=tables)
        A = intg.element_matrices(H, 0, 0, tables=tables)
        return jnp.sum(A)

    # plane-contraction route: A[e, (v i)(w j)] =
    #   sum_{a b} sum_q H[(v a),(w b)][e, q] * W0[(q a b), (i j)]
    # as vdim^2 batched GEMMs (batch = (a, b) pairs) + a leading-dim
    # reduction — never transposes the (ne, nq) batch into the K dim.
    v = fes.vdim
    sd = intg.sd[0]
    nd = intg.nd[0]
    W0 = np.asarray(tables["W0"]["0_0"]).reshape(intg.nq, sd, sd, nd * nd)
    W0ab = jnp.asarray(
        np.transpose(W0, (1, 2, 0, 3)), dtype=jnp.float32
    )  # [sd, sd, nq, nd*nd]

    def plane(tables, uu):
        H = intg.hess_state([uu], tables=tables)
        H6 = H.reshape(ne, intg.nq, v, sd, v, sd)
        Hp = jnp.transpose(H6, (2, 4, 3, 5, 0, 1))  # [v, w, a, b, ne, nq]
        # batched GEMM: [(v w a b), ne, nq] @ [(a b) -> nq, nd*nd]
        Hb = Hp.reshape(v * v, sd * sd, ne, intg.nq)
        Wb = W0ab.reshape(sd * sd, intg.nq, nd * nd)
        Y = jnp.einsum("pkeq,kqj->pkej", Hb, Wb,
                       precision=jax.lax.Precision.HIGH)
        A = Y.sum(axis=1)  # [v*v, ne, nd*nd]
        return jnp.sum(A)

    # flattened-batch AD: the same jacfwd Hessian but with the (ne, nq)
    # batch merged to 1-D BEFORE the AD stage, so every elementwise
    # tangent op runs on a [ne*nq] vector (full 128-lane tiles) instead
    # of [ne, 27] (27/128 lanes)
    def ad_flat(tables, uu):
        x = intg.x_qp([uu], tables)  # [ne, nq, n]
        pshape = intg.eval_params({}, tables)
        B = ne * intg.nq
        xf = x.reshape(B, nin)
        pf = {k: jnp.broadcast_to(
            v, (ne, intg.nq) + v.shape[2:]
        ).reshape((B,) + v.shape[2:]) for k, v in pshape.items()}
        Hf = jax.vmap(jax.jacfwd(jax.grad(intg.f.energy)))(xf, pf)
        return jnp.sum(Hf)

    def full_flat(tables, uu):
        x = intg.x_qp([uu], tables)
        pshape = intg.eval_params({}, tables)
        B = ne * intg.nq
        xf = x.reshape(B, nin)
        pf = {k: jnp.broadcast_to(
            v, (ne, intg.nq) + v.shape[2:]
        ).reshape((B,) + v.shape[2:]) for k, v in pshape.items()}
        Hf = jax.vmap(jax.jacfwd(jax.grad(intg.f.energy)))(xf, pf)
        H = Hf.reshape(ne, intg.nq, nin, nin) * tables["w"][..., None, None]
        A = intg.element_matrices(H, 0, 0, tables=tables)
        return jnp.sum(A)

    for name, fn in (("resid", resid), ("ad_only", ad_only),
                     ("full", full), ("plane", plane),
                     ("ad_flat", ad_flat), ("full_flat", full_flat)):
        sec = timed_scan(fn, tables, u)
        print(f"  {name:8s} {sec*1e3:9.3f} ms  {ne/sec:.3e} elem/s",
              flush=True)


if __name__ == "__main__":
    main()
