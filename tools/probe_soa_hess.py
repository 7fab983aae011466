"""Probe: is the Hessian stage bound by minor-dim-n layout?  Compare
(a) qpmap jacfwd (AoS, trailing [n, n]),
(b) closed-form evaluated on SoA component planes [n, ne, nq] with
    outputs stacked plane-major [n, n, ne, nq],
(c) a trivial writer of each output shape (pure memory cost).
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


def bench(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    for dim, n0, p in [(2, 512, 1), (3, 32, 1)]:
        m = (M.make_cartesian_2d(n0, n0) if dim == 2
             else M.make_cartesian_3d(n0, n0, n0))
        sp = FESpace(m, p, vdim=dim)
        intg = ADBlockIntegrator(
            NeoHookeanEnergy(dim, 1.0, 1.0), [sp],
            [ADEval.GRAD | ADEval.VECTOR],
        )
        t = intg.tables
        ne, nq, n = sp.num_elements, intg.nq, intg.n_input
        rng = np.random.default_rng(0)
        u = jnp.asarray(0.05 / (n0 * p) * rng.standard_normal(sp.ndof),
                        dtype=intg.dtype)
        x = jax.jit(lambda u: intg.x_qp([u], t, True))(u)
        p_ = intg.eval_params({}, t, True)
        f = intg.f
        pT = {k: jnp.moveaxis(v, -1, 0) for k, v in p_.items()}

        h_aos = jax.jit(lambda x: qpmap(jax.jacfwd(jax.grad(f.energy)))(x, p_))

        @jax.jit
        def h_soa(x):
            xT = jnp.moveaxis(x, -1, 0)  # [n, ne, nq]
            Hp = f.hessian_closed(xT, pT)  # [n, n, ne, nq] plane-major
            return Hp

        @jax.jit
        def w_aos(x):
            return jnp.broadcast_to(
                (x[..., :1] * 2.0)[..., None], (ne, nq, n, n)
            ) + 0.0

        @jax.jit
        def w_soa(x):
            v = x[..., 0] * 2.0
            return jnp.broadcast_to(v[None, None], (n, n, ne, nq)) + 0.0

        ta = bench(h_aos, x)
        tb = bench(h_soa, x)
        twa = bench(w_aos, x)
        tws = bench(w_soa, x)
        # correctness
        Ha = np.asarray(h_aos(x))
        Hb = np.moveaxis(np.asarray(h_soa(x)), (0, 1), (2, 3))
        err = np.abs(Ha - Hb).max()
        print(
            f"dim={dim} p={p} ne={ne} nq={nq} n={n}:"
            f" aos-jacfwd {ta*1e3:7.2f} ms | soa-closed {tb*1e3:7.2f} ms"
            f" ({ta/tb:5.2f}x) | write aos {twa*1e3:6.2f} soa {tws*1e3:6.2f}"
            f" ms | err {err:.1e}", flush=True,
        )


if __name__ == "__main__":
    main()
