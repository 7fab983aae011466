"""Stage breakdown of the unstructured (generic-B) assembly pass on TPU.

Stages timed inside one jit each (differenced scan):
  gather    u[edof] element gather (row form)
  interp    x = B^T u with element-varying B
  resid     full residual
  scatter   transpose-gather scatter of a residual-shaped value
  state     per-qp AD Hessian (hess_state)
  elmat     element matrices from state (B H B^T einsum, element B)
  jac       full hess_state + element_matrices
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402


def timed_scan(build_fn, tables, u, reps0=20, reps1=120):
    def make(reps):
        @jax.jit
        def run(tables, u):
            def body(acc, c):
                return acc + build_fn(tables, u * c), None

            cs = 1.0 + jnp.arange(reps, dtype=jnp.float32) * 1e-6
            out, _ = jax.lax.scan(body, jnp.float32(0.0), cs)
            return out

        return run

    r0, r1 = make(reps0), make(reps1)

    def t(run):
        float(run(tables, u))  # fetch the scalar: block_until_ready is
        ts = []                # unreliable on the axon tunnel (see bench)
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(tables, u))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max((t(r1) - t(r0)) / (reps1 - reps0), 1e-12)


def main():
    refs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    m, fes, intg, u = bench._build_unstructured(order=1, refs=refs)
    tables = intg.tables
    ne = m.num_elements
    print(f"unstructured p1/2D ne={ne} nq={intg.nq} nd={intg.nd[0]}",
          flush=True)

    def gather(t, uu):
        return jnp.sum(intg.gather(0, intg.spaces[0].vdim and uu, t))

    def interp(t, uu):
        return jnp.sum(intg.x_qp([uu], t))

    def resid(t, uu):
        return jnp.sum(intg.residual([uu], tables=t)[0])

    def scat(t, uu):
        ue = intg.gather(0, uu, t)
        return jnp.sum(intg.scatter(0, ue, t))

    def state(t, uu):
        return jnp.sum(intg.hess_state([uu], tables=t))

    def jac(t, uu):
        H = intg.hess_state([uu], tables=t)
        return jnp.sum(intg.element_matrices(H, 0, 0, tables=t))

    for name, fn in (("gather", gather), ("interp", interp),
                     ("resid", resid), ("scatter", scat),
                     ("state", state), ("jac", jac)):
        sec = timed_scan(fn, tables, u)
        print(f"  {name:8s} {sec*1e3:9.3f} ms  {ne/sec:.3e} elem/s",
              flush=True)


if __name__ == "__main__":
    main()
