"""On-chip A/B of Hq-apply formulations for the Krylov matvec (round 4).

The einsum "eqnm,eqm->eqn" (batched 9x9 matvec over ne*nq points) measured
196 ms at elast3d shapes — XLA lowers it as tiny batched dot_generals.
Candidates:
  A. einsum (current)
  B. planar-full: Hq as [n, m, B] planes, unrolled FMAs on [B] vectors
  C. planar-sym: packed triangle [K, B] planes, 2K-n FMA chains
  D. bmm: jnp.matmul([B, n, m], [B, m, 1])
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(fn, *args, reps=30):
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
    ne, nq, n = 13824, 27, 9
    B = ne * nq
    dt = jnp.dtype(os.environ.get("PROBE_DT", "float64"))
    rng = np.random.default_rng(0)
    H = jnp.asarray(rng.standard_normal((ne, nq, n, n)), dtype=dt)
    H = H + jnp.swapaxes(H, 2, 3)  # symmetric
    x = jnp.asarray(rng.standard_normal((ne, nq, n)), dtype=dt)

    Hp = jnp.asarray(np.transpose(np.asarray(H), (2, 3, 0, 1)).reshape(
        n, n, B))
    pairs = [(a, b) for a in range(n) for b in range(a, n)]
    Ht = jnp.stack([Hp[a, b] for a, b in pairs])  # [K, B]

    f_einsum = jax.jit(lambda H, x: jnp.einsum("eqnm,eqm->eqn", H, x))

    def planar_full(Hp, x):
        xT = x.reshape(B, n).T  # [n, B]
        out = []
        for i in range(n):
            acc = Hp[i, 0] * xT[0]
            for j in range(1, n):
                acc = acc + Hp[i, j] * xT[j]
            out.append(acc)
        return jnp.stack(out, axis=1).reshape(ne, nq, n)

    def planar_sym(Ht, x):
        xT = x.reshape(B, n).T
        acc = [None] * n
        for k, (a, b) in enumerate(pairs):
            t = Ht[k]
            ta = t * xT[b]
            acc[a] = ta if acc[a] is None else acc[a] + ta
            if a != b:
                tb = t * xT[a]
                acc[b] = tb if acc[b] is None else acc[b] + tb
        return jnp.stack(acc, axis=1).reshape(ne, nq, n)

    f_pf = jax.jit(planar_full)
    f_ps = jax.jit(planar_sym)
    f_bmm = jax.jit(
        lambda H, x: jnp.matmul(
            H.reshape(B, n, n), x.reshape(B, n, 1)
        ).reshape(ne, nq, n)
    )

    ra = f_einsum(H, x)
    for name, r in (("planar_full", f_pf(Hp, x)), ("planar_sym", f_ps(Ht, x)),
                    ("bmm", f_bmm(H, x))):
        err = float(jnp.max(jnp.abs(r - ra)) / jnp.max(jnp.abs(ra)))
        assert err < 1e-5, (name, err)

    print(
        f"dtype={dt}: einsum={timeit(f_einsum, H, x)*1e3:.3f} ms  "
        f"planar_full={timeit(f_pf, Hp, x)*1e3:.3f} ms  "
        f"planar_sym={timeit(f_ps, Ht, x)*1e3:.3f} ms  "
        f"bmm={timeit(f_bmm, H, x)*1e3:.3f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
