"""A/B the per-qp AD Hessian stage (VERDICT r4 #1): vmapped jacfwd
(tangent batch = minor dim n, lane-starved) vs unrolled jax.linearize
seed pushes (every tangent intermediate is a full-lane [ne, nq] array).

Run on the chip:  python tools/probe_hess_ad.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MFEM_AD_TPU_NO_X64", "1")

import jax
import jax.numpy as jnp
import numpy as np

from mfem_ad_tpu import mesh as M
from mfem_ad_tpu.ad import NeoHookeanEnergy
from mfem_ad_tpu.adeval import ADEval
from mfem_ad_tpu.fespace import FESpace
from mfem_ad_tpu.integrator import ADBlockIntegrator, qpmap


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # differenced timing (tunnel RTT ~20-40 ms/call)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    for dim, n0, p in [(2, 512, 1), (3, 32, 1), (3, 16, 2)]:
        if dim == 2:
            m = M.make_cartesian_2d(n0, n0)
        else:
            m = M.make_cartesian_3d(n0, n0, n0)
        sp = FESpace(m, p, vdim=dim)
        intg = ADBlockIntegrator(
            NeoHookeanEnergy(dim, 1.0, 1.0), [sp],
            [ADEval.GRAD | ADEval.VECTOR],
        )
        t = intg.tables
        ne = sp.num_elements
        rng = np.random.default_rng(0)
        h = 1.0 / (n0 * p)
        u = jnp.asarray(0.05 * h * rng.standard_normal(sp.ndof),
                        dtype=intg.dtype)
        n = intg.n_input

        def make_x(u):
            return intg.x_qp([u], t, True)

        x = jax.jit(make_x)(u)
        p_ = intg.eval_params({}, t, True)
        f = intg.f

        @jax.jit
        def h_jacfwd(x):
            return qpmap(jax.jacfwd(jax.grad(f.energy)))(x, p_)

        @jax.jit
        def h_linearize(x):
            def per_qp(xq, pq):
                gfun = lambda xx: jax.grad(f.energy)(xx, pq)
                _, lin = jax.linearize(gfun, xq)
                rows = [lin(jnp.zeros((n,), xq.dtype).at[a].set(1.0))
                        for a in range(n)]
                return jnp.stack(rows)

            return qpmap(per_qp)(x, p_)

        @jax.jit
        def h_linearize_planes(x):
            """Plane output form: [K, ne, nq] upper triangle directly."""
            def per_qp(xq, pq):
                gfun = lambda xx: jax.grad(f.energy)(xx, pq)
                _, lin = jax.linearize(gfun, xq)
                outs = []
                for a in range(n):
                    row = lin(jnp.zeros((n,), xq.dtype).at[a].set(1.0))
                    outs.extend(row[b] for b in range(a, n))
                return jnp.stack(outs)

            return jnp.moveaxis(qpmap(per_qp)(x, p_), -1, 0)

        ta = bench(h_jacfwd, x)
        tb = bench(h_linearize, x)
        tc = bench(h_linearize_planes, x)
        Ha = np.asarray(h_jacfwd(x))
        Hb = np.asarray(h_linearize(x))
        err = np.abs(Ha - Hb).max() / max(1.0, np.abs(Ha).max())
        print(
            f"dim={dim} p={p} ne={ne} n={n}: jacfwd {ta*1e3:8.2f} ms"
            f" | linearize {tb*1e3:8.2f} ms ({ta/tb:5.2f}x)"
            f" | planes {tc*1e3:8.2f} ms ({ta/tc:5.2f}x)  relerr={err:.1e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
