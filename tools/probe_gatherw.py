import os, sys, time
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
os.environ.setdefault("MFEM_AD_TPU_NO_X64", "1")
import jax, jax.numpy as jnp, numpy as np

N = 800_000   # table rows
M_ = 131_000  # output rows
V = 7
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, N, size=(M_, V)), dtype=jnp.int32)
idx1 = jnp.asarray(np.sort(rng.integers(0, N, size=(M_,))), dtype=jnp.int32)

def diffrate(make, r0=4, r1=12):
    run0, run1 = make(r0), make(r1)
    float(run0()); float(run1())
    def timed(run):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter(); float(run()); ts.append(time.perf_counter()-t0)
        return min(ts)
    return max((timed(run1) - timed(run0)) / (r1 - r0), 1e-12)

for width in (2, 8, 16, 128):
    A = jnp.asarray(rng.standard_normal((N, width)), dtype=jnp.float32)
    def make(reps, A=A):
        @jax.jit
        def run():
            def body(acc, c):
                g = (A * c)[idx]  # [M, V, width] valence gather
                return acc + jnp.sum(g.sum(axis=1)), None
            cs = 1.0 + jnp.arange(reps, dtype=jnp.float32) * 1e-6
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), cs)
            return acc
        return run
    t_ = diffrate(make)
    rows = M_ * V
    print(f"width {width:4d}: {t_*1e3:7.2f} ms  ({rows/t_/1e6:7.1f} Mrow/s, "
          f"{rows*width*4/t_/1e9:7.1f} GB/s useful)", flush=True)

# single-index (non-valence) gather for comparison
for width in (2, 16):
    A = jnp.asarray(rng.standard_normal((N, width)), dtype=jnp.float32)
    def make(reps, A=A):
        @jax.jit
        def run():
            def body(acc, c):
                g = (A * c)[idx1]
                return acc + jnp.sum(g), None
            cs = 1.0 + jnp.arange(reps, dtype=jnp.float32) * 1e-6
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), cs)
            return acc
        return run
    t_ = diffrate(make)
    print(f"single w{width:4d}: {t_*1e3:7.2f} ms ({M_/t_/1e6:7.1f} Mrow/s)", flush=True)
