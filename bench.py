"""Benchmark: AD element Jacobians assembled per second (BASELINE.md).

Measures the reference's hot path (AssembleElementGrad,
/root/reference/src/ad_intg.hpp:260-334) end-to-end on one chip: per-qp
input gather x = B^T u, per-qp energy Hessian via forward-over-reverse AD,
and the fused B H B^T w contraction into dense element Jacobian blocks —
for the ex3 2D linear-elasticity energy (GRAD|VECTOR, Q1, 2p+2 quadrature),
in float32 (the TPU-native precision for the perf path).

Methodology notes:
- the tabulated tensors are jit *arguments*, not closures — closed-over
  device arrays are embedded as XLA constants, which inflates compile time
  ~200x on a tunneled TPU;
- the accumulator folds in sum(A) so XLA cannot dead-code any element;
- reps run inside one jitted fori_loop and the rate comes from differencing
  two loop lengths (cancels launch overhead + tunnel latency).

Baseline normalization: the reference publishes no numbers
(BASELINE.json "published": {}).  The north-star target is >= 10x an MFEM
64-core CPU baseline; we normalize against an estimated 1.0e7 element
Jacobians/sec for that machine (measured MFEM-class CPU codes assemble
~1-3e5 Q1 AD element Jacobians/core/sec; 64 cores ~ 1e7).  So
vs_baseline = value / 1.0e7, and the >=10x target means vs_baseline >= 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

os.environ.setdefault("MFEM_AD_TPU_NO_X64", "1")  # bench in f32

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

MFEM_64CORE_BASELINE = 1.0e7  # element Jacobians / sec (estimate, see above)


def main():
    from mfem_ad_tpu import mesh as M
    from mfem_ad_tpu.ad import NeoHookeanEnergy
    from mfem_ad_tpu.adeval import ADEval
    from mfem_ad_tpu.fespace import FESpace
    from mfem_ad_tpu.integrator import ADBlockIntegrator

    n = int(os.environ.get("BENCH_N", "512"))
    order = int(os.environ.get("BENCH_ORDER", "1"))
    m = M.make_cartesian_2d(n, n)
    dim = 2
    fes = FESpace(m, order, vdim=dim)
    # neo-Hookean: state-dependent Hessian, so XLA cannot hoist the per-qp
    # AD out of the timing loop (a quadratic energy has a constant Jacobian
    # and benches as fast as XLA can prove it constant)
    intg = ADBlockIntegrator(
        NeoHookeanEnergy(dim, 1.0, 1.0),
        [fes],
        [ADEval.GRAD | ADEval.VECTOR],
        dtype=jnp.float32,
    )
    ne = m.num_elements

    def make_loop(reps: int):
        @jax.jit
        def run(tables, u):
            def body(acc, c):
                # a distinct input scaling per iteration prevents both
                # loop-invariant hoisting and DCE of any element
                Hq = intg.hess_state([u * c], tables=tables)
                A = intg.element_matrices(Hq, 0, 0, tables=tables)
                return acc + jnp.sum(A), None

            cs = 1.0 + jnp.arange(reps, dtype=jnp.float32) * 1e-6
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), cs)
            return acc

        return run

    rng = np.random.default_rng(0)
    # small displacements keep det(F) > 0 (valid neo-Hookean state)
    u = jnp.asarray(0.02 * rng.standard_normal(fes.ndof), dtype=jnp.float32)

    r0 = int(os.environ.get("BENCH_REPS0", "20"))
    r1 = int(os.environ.get("BENCH_REPS1", "220"))
    run0, run1 = make_loop(r0), make_loop(r1)
    float(run0(intg.tables, u))  # compile + device sync (fetch the scalar:
    float(run1(intg.tables, u))  # block_until_ready is unreliable on axon)

    def timed(run):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(intg.tables, u))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t0, t1 = timed(run0), timed(run1)
    per_rep = max((t1 - t0) / (r1 - r0), 1e-12)
    rate = ne / per_rep

    print(
        json.dumps(
            {
                "metric": "element_jacobians_per_sec",
                "value": rate,
                "unit": "elem/s",
                "vs_baseline": rate / MFEM_64CORE_BASELINE,
            }
        )
    )


if __name__ == "__main__":
    main()
