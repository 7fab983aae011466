"""A/B the closed-form vs AD Hessian/gradient on the chip: stage times
and full residual/Jacobian pass rates at the sweep configs."""

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
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    cases = [(2, 512, 1), (2, 256, 2), (2, 128, 3),
             (3, 32, 1), (3, 32, 2), (3, 16, 3)]
    for dim, n0, p in cases:
        m = (M.make_cartesian_2d(n0, n0) if dim == 2
             else M.make_cartesian_3d(n0, n0, n0))
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
        x = jax.jit(lambda u: intg.x_qp([u], t, True))(u)
        p_ = intg.eval_params({}, t, True)
        f = intg.f

        h_ad = jax.jit(lambda x: qpmap(jax.jacfwd(jax.grad(f.energy)))(x, p_))
        h_cl = jax.jit(lambda x: qpmap(f.hessian_closed)(x, p_))
        err = float(jnp.max(jnp.abs(h_ad(x) - h_cl(x))))

        # full Jacobian pass (state + element matrices)
        def jac_pass(u):
            Hq = intg.hess_state([u])
            return intg.element_matrices(Hq, 0, 0)

        def res_pass(u):
            return intg.residual([u])

        os.environ["MFEM_AD_TPU_CLOSED"] = "0"
        jp_ad = jax.jit(jac_pass)
        rp_ad = jax.jit(res_pass)
        t_jad, t_rad = bench(jp_ad, u), bench(rp_ad, u)
        os.environ["MFEM_AD_TPU_CLOSED"] = "1"
        jp_cl = jax.jit(jac_pass)
        rp_cl = jax.jit(res_pass)
        t_jcl, t_rcl = bench(jp_cl, u), bench(rp_cl, u)
        errA = float(jnp.max(jnp.abs(jp_ad(u) - jp_cl(u))))

        ta, tc = bench(h_ad, x), bench(h_cl, x)
        print(
            f"dim={dim} p={p} ne={ne}: hess {ta*1e3:7.2f}->{tc*1e3:7.2f} ms"
            f" ({ta/tc:4.2f}x) | jacpass {ne/t_jad/1e6:7.2f}->"
            f"{ne/t_jcl/1e6:7.2f} Melem/s ({t_jad/t_jcl:4.2f}x)"
            f" | res {ne/t_rad/1e6:7.1f}->{ne/t_rcl/1e6:7.1f} Melem/s"
            f" ({t_rad/t_rcl:4.2f}x) err={err:.1e}/{errA:.1e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
