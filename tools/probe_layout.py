"""Why is the framework's Hq-apply 196 ms when the same-shape einsum runs
at 1 ms standalone?  Suspect: XLA output layout of the jitted grad_state.
Compare einsum time on (a) the jit-produced Hq, (b) a relaid-out copy.
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
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


def main():
    os.environ["MFEM_AD_TPU_SYM_STATE"] = "0"
    form, fields, amp = _build_case("elast3d")
    rng = np.random.default_rng(0)
    x = jnp.asarray(amp * rng.standard_normal(form.ndof))
    tables = form._tables()
    st = jax.jit(form.grad_state_raw)(tables, x, fields)
    Hq = st[0]
    print("Hq shape/dtype:", Hq.shape, Hq.dtype)
    print("Hq format:", Hq.format if hasattr(Hq, "format") else "-")
    try:
        print("layout:", Hq.sharding, Hq.addressable_shards[0].data.layout)
    except Exception as e:  # pragma: no cover
        print("layout introspection failed:", e)

    intg = form.integrators[0]
    xv = jax.jit(lambda u: intg.x_qp(form.split(u), tables[0]))(x)

    f_apply = jax.jit(lambda H, g: jnp.einsum("eqnm,eqm->eqn", H, g))
    t_jitprod = timeit(f_apply, Hq, xv)

    H2 = jnp.asarray(np.asarray(Hq))  # host roundtrip -> default layout
    t_fresh = timeit(f_apply, H2, xv)

    H3 = jax.device_put(Hq)  # device_put of device array
    t_dput = timeit(f_apply, H3, xv)

    print(
        f"einsum on jit-produced Hq: {t_jitprod*1e3:.3f} ms   "
        f"on host-roundtrip copy: {t_fresh*1e3:.3f} ms   "
        f"on device_put copy: {t_dput*1e3:.3f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
