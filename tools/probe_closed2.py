"""Scan-differenced A/B of the AD vs closed-form Hessian stage (the
per-call tunnel dispatch floor ~1.4 ms poisons plain loops; reps run
inside one jitted lax.scan and the per-rep cost comes from differencing
two rep counts — same technique as bench.py)."""

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


def diffrate(make_run, r0=4, r1=12):
    run0, run1 = make_run(r0), make_run(r1)
    float(run0())
    float(run1())

    def timed(run):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max((timed(run1) - timed(run0)) / (r1 - r0), 1e-12)


def main():
    sel = os.environ.get("PROBE_CONFIGS", "0,2")
    allc = [(2, 512, 1), (2, 256, 2), (3, 32, 1), (3, 32, 2)]
    for idx in [int(s) for s in sel.split(",")]:
        dim, n0, p = allc[idx]
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

        def stage_loop(stage):
            def make(reps):
                @jax.jit
                def run():
                    def body(acc, c):
                        H = stage(x * c)
                        return acc + jnp.sum(H), None
                    cs = 1.0 + jnp.arange(reps, dtype=jnp.float32) * 1e-6
                    acc, _ = jax.lax.scan(body, jnp.float32(0.0), cs)
                    return acc
                return run
            return make

        h_ad = lambda x: qpmap(jax.jacfwd(jax.grad(f.energy)))(x, p_)
        h_cl = lambda x: qpmap(f.hessian_closed)(x, p_)

        def h_soa(x):
            xT = jnp.moveaxis(x, -1, 0)
            return f.hessian_closed(xT, pT)

        def h_write(x):
            return jnp.broadcast_to(
                (x[..., :1] * 2.0)[..., None], (ne, nq, n, n)
            ) + 0.0

        def jacpass(mode):
            os.environ["MFEM_AD_TPU_CLOSED"] = mode

            def make(reps):
                @jax.jit
                def run():
                    def body(acc, c):
                        Hq = intg.hess_state([u * c], tables=t)
                        A = intg.element_matrices(Hq, 0, 0, tables=t)
                        return acc + jnp.sum(A), None
                    cs = 1.0 + jnp.arange(reps, dtype=jnp.float32) * 1e-6
                    acc, _ = jax.lax.scan(body, jnp.float32(0.0), cs)
                    return acc
                return run
            r = diffrate(make)
            return r

        t_ad = diffrate(stage_loop(h_ad))
        t_cl = diffrate(stage_loop(h_cl))
        t_soa = diffrate(stage_loop(h_soa))
        t_w = diffrate(stage_loop(h_write))
        tj_ad = jacpass("0")
        tj_cl = jacpass("1")
        print(
            f"dim={dim} p={p} ne={ne} nq={nq} n={n}: stage"
            f" ad={t_ad*1e3:6.2f} cl={t_cl*1e3:6.2f}"
            f" soa={t_soa*1e3:6.2f} write={t_w*1e3:6.2f} ms"
            f" | jacpass {ne/tj_ad/1e6:7.2f} -> {ne/tj_cl/1e6:7.2f}"
            f" Melem/s ({tj_ad/tj_cl:4.2f}x)", flush=True,
        )


if __name__ == "__main__":
    main()
