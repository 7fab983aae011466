"""Scan-differenced A/B: jacfwd(grad(energy)) vs jacfwd(gradient_closed)
— the hybrid keeps jacfwd's GEMM-friendly output structure but
differentiates the ~5x-cheaper closed gradient."""

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
    sel = os.environ.get("PROBE_CONFIGS", "0,1")
    allc = [(2, 512, 1), (3, 32, 1)]
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
        p_ = intg.eval_params({}, t, True)
        f = intg.f

        def hess_of(kind):
            if kind == "ad":
                return lambda x: qpmap(jax.jacfwd(jax.grad(f.energy)))(x, p_)
            if kind == "hyb":
                return lambda x: qpmap(jax.jacfwd(
                    lambda xq, pq: f.gradient_closed(xq, pq)
                ))(x, p_)
            if kind == "ff":
                return lambda x: qpmap(jax.jacfwd(jax.jacfwd(f.energy)))(x, p_)
            if kind == "rf":
                return lambda x: qpmap(jax.jacrev(jax.jacfwd(f.energy)))(x, p_)
            return lambda x: qpmap(f.hessian_closed)(x, p_)

        def passrate(kind):
            hf = hess_of(kind)

            def make(reps):
                @jax.jit
                def run():
                    def body(acc, c):
                        x = intg.x_qp([u * c], t, True)
                        H = hf(x) * t["w"][..., None, None]
                        A = intg.element_matrices(H, 0, 0, tables=t)
                        return acc + jnp.sum(A), None
                    cs = 1.0 + jnp.arange(reps, dtype=jnp.float32) * 1e-6
                    acc, _ = jax.lax.scan(body, jnp.float32(0.0), cs)
                    return acc
                return run
            return ne / diffrate(make)

        ra = passrate("ad")
        rf_ = passrate("ff")
        rr = passrate("rf")
        x = jax.jit(lambda u: intg.x_qp([u], t, True))(u)
        Ha = np.asarray(hess_of("ad")(x))
        err = max(np.abs(Ha - np.asarray(hess_of(k)(x))).max()
                  for k in ("ff", "rf"))
        print(
            f"dim={dim} p={p}: jacpass fwd-rev {ra/1e6:7.2f} | fwd-fwd"
            f" {rf_/1e6:7.2f} ({rf_/ra:4.2f}x) | rev-fwd {rr/1e6:7.2f}"
            f" ({rr/ra:4.2f}x) Melem/s  err={err:.1e}", flush=True,
        )


if __name__ == "__main__":
    main()
