"""On-chip breakdown probe of the Krylov matvec (grad_mult) stages.

Times each stage of hess_mult separately (gather+interp, Hq apply,
restriction GEMM, scatter) in both f64 and f32, to locate where the
198 ms elast3d / 4.9 ms ex4 matvec actually goes (round 4).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench_matvec import _build_case  # noqa: E402


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


def main():
    case = os.environ.get("BM_CASE", "elast3d")
    form, fields, amp = _build_case(case)
    rng = np.random.default_rng(0)
    x64 = jnp.asarray(amp * rng.standard_normal(form.ndof))
    tables = form._tables()
    ess = form.ess_mask

    os.environ["MFEM_AD_TPU_SYM_STATE"] = "0"
    st = jax.jit(form.grad_state_raw)(tables, x64, fields)
    jax.block_until_ready(st)

    intg = form.integrators[0]
    t0 = tables[0]
    Hq = st[0]

    def cast(tree, dt):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dt) if jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            tree,
        )

    for dt in (jnp.float64, jnp.float32):
        x = x64.astype(dt)
        td = cast(t0, dt)
        Hd = cast(Hq, dt)

        blocks = form.split(x)

        f_gather = jax.jit(lambda b: intg.x_qp(b, td))
        xv = f_gather(blocks)

        f_apply = jax.jit(lambda H, g: jnp.einsum("eqnm,eqm->eqn", H, g))
        Hxv = f_apply(Hd, xv)

        f_rest = jax.jit(
            lambda g: [
                intg._re_from_g(g, s, td) for s in range(len(intg.spaces))
            ]
        )
        res = f_rest(Hxv)

        f_scat = jax.jit(
            lambda rs: [
                intg.scatter(s, rs[s], td) for s in range(len(intg.spaces))
            ]
        )

        f_full = jax.jit(
            lambda H, b: intg.hess_mult(H, form.split(b), td)
        )

        print(
            f"{case} {np.dtype(dt).name}: "
            f"gather+interp={timeit(f_gather, blocks)*1e3:.3f} ms  "
            f"Hq-apply={timeit(f_apply, Hd, xv)*1e3:.3f} ms  "
            f"restrict={timeit(f_rest, Hxv)*1e3:.3f} ms  "
            f"scatter={timeit(f_scat, res)*1e3:.3f} ms  "
            f"hess_mult-total={timeit(f_full, Hd, x)*1e3:.3f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
