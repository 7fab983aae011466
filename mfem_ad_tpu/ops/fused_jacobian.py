"""Pallas TPU kernel: fused AD element-Jacobian assembly.

The XLA path for ``AssembleElementGrad`` (reference ad_intg.hpp:260-334)
materializes the per-qp Hessian tensor ``Hq [ne, nq, n, n]`` in HBM between
the AD stage and the ``A = Hflat @ W`` GEMM — ~150 MB of round-trip traffic
per assembly pass at Q1/2D/256k elements.  This kernel fuses the whole
pipeline per element block inside VMEM:

    x  = R @ ue^T                     (MXU)  [nq*n, BLK]
    H  = vmap(jacfwd(grad(f)))(x)     (VPU)  [nq, n, n, BLK]  (VMEM only)
    A  = W^T @ (H * w)                (MXU)  [nde*nde, BLK]

HBM traffic becomes: read ue^T [nde, ne], write A [nde^2, ne] — nothing
else.  The energy's AD graph is traced at kernel-trace time (jax.grad of
plain jnp code), so arbitrary user energies work unchanged.

Mosaic layout note: the ELEMENT axis is kept as the minor (lane) dimension
throughout — per-point quantities live in leading dims, so every reshape is
a leading-dim split/merge (supported) and every elementwise AD op runs on
[..., BLK] vectors with full lane utilization.  The AoS layout
([BLK, nq, n]) fails to compile: Mosaic cannot shape-cast splits of the
minor dimension.

Constraints (callers fall back to the XLA path otherwise):
- element-shared B tables (the structured/uniform-mesh case), so R/W are
  single small matrices that live in VMEM;
- element-shared static parameters and quadrature weights;
- single-space integrators (the bench-critical case);
- the point energy must trace to pure elementwise scalar arithmetic —
  no reshape-to-matrix (Mosaic cannot split the minor dim of the vmapped
  AD graph), no tiny dot_general, no traced array constants.  The whole
  built-in energy library satisfies this: Mass/Diffusion/Elasticity are
  scalar-unrolled, and neo-Hookean's log(det F) goes through the
  component-level custom-JVP core in ad.py (logdet_flat), whose
  derivative rules are product forms — the raw nested-jvp division
  chains of log∘det are exactly what Mosaic miscompiled in round 1.

Status (v5e, 2026-08, round 2): compiles and matches the XLA path to
f32-matmul noise (~1e-5 rel) for the full energy library INCLUDING
neo-Hookean, verified on-chip against the XLA GEMM path
(tests/test_tpu_smoke.py).  Performance: 6.4M elem/s vs the XLA path's
178.7M at Q1/2D — the statically-unrolled per-qp dots (shapes like
[64, 4] x [4, blk]) starve the MXU, while XLA's single
[ne, nq n^2] @ [nq n^2, nde^2] GEMM saturates it.  The XLA route
therefore stays the default; opt in with MFEM_AD_TPU_FUSED=1 (see
integrator.element_jacobians).  Next step for this kernel: accumulate
all qps' Hessians in VMEM ([nq n^2, blk], ~0.5 MB) and contract with ONE
[nde^2, nq n^2] dot per block.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(energy, nq, n, pnames, uet_ref, R_ref, Wt_ref,
            *param_refs_and_out):
    param_refs = param_refs_and_out[:-1]
    out_ref = param_refs_and_out[-1]
    blk = uet_ref.shape[1]
    dt = uet_ref.dtype

    # x[(q,m), e] = R[(q,m), i] ue[i, e]
    x = jnp.dot(R_ref[:], uet_ref[:], preferred_element_type=dt,
                precision=jax.lax.Precision.HIGHEST)
    x3 = x.reshape(nq, n, blk)  # leading-dim split: Mosaic-legal

    hess_pt = jax.jacfwd(jax.grad(energy))
    per_pt = jax.vmap(hess_pt, in_axes=(1, None), out_axes=2)

    # Statically-unrolled qp loop: contracting each qp's Hessian into the
    # accumulator immediately keeps peak VMEM at one qp's AD graph (the
    # all-qps-at-once form allocates ~100 MB of live intermediates).
    # Quadrature weights are pre-folded into Wt on the host.
    acc = jnp.zeros((out_ref.shape[0], blk), dt)
    for q in range(nq):
        pq = {k: r[q] for k, r in zip(pnames, param_refs)}
        Hq = per_pt(x3[q], pq)  # [n, n, blk], element axis minor
        acc = acc + jnp.dot(
            Wt_ref[:, q * n * n : (q + 1) * n * n],
            Hq.reshape(n * n, blk),
            preferred_element_type=dt,
            precision=jax.lax.Precision.HIGHEST,
        )
    out_ref[:] = acc


def fused_element_jacobian(
    ue, R, W, wq, energy, params, nq: int, n: int, nde: int,
    block: int = 512, interpret: bool = False,
):
    """A_e = sum_q w_q B_q^T H(x_q) B_q for all elements, fused in VMEM.

    Args:
        ue: [ne, nde] element dof values (fast-gathered, (v,d) flat).
        R:  [nq*n, nde] shared input-interpolation matrix.
        W:  [nq*n*n, nde*nde] shared contraction factor (B (x) B).
        wq: [nq] shared quadrature weights (detJ * w, element-invariant).
        energy: scalar point energy f(x[n], params) -> ().
        params: dict name -> [nq, k] shared per-qp parameter values.
        nq, n, nde: static sizes.
        block: elements per grid step (lane-dim tile; multiple of 128).
        interpret: run in interpreter mode (CPU testing).

    Returns:
        A [ne, nde, nde] dense element Jacobians.
    """
    ne = ue.shape[0]
    pad = (-ne) % block
    uet = ue.T  # [nde, ne]
    if pad:
        uet = jnp.concatenate(
            [uet, jnp.zeros((nde, pad), ue.dtype)], axis=1
        )
    nep = ne + pad
    pnames = tuple(sorted(params))
    pvals = [jnp.asarray(params[k]) for k in pnames]
    # fold the (element-invariant) quadrature weights into the contraction
    # factor so the kernel needs no small-vector broadcast
    wrep = jnp.repeat(jnp.asarray(wq, W.dtype), n * n)  # [nq*n*n]
    Wt = (W * wrep[:, None]).T  # [nde*nde, nq*n*n]

    grid = (nep // block,)
    kernel = functools.partial(_kernel, energy, nq, n, pnames)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (nde, block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # R (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w-folded W^T (full)
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in pnames],
        out_specs=pl.BlockSpec(
            (nde * nde, block), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nde * nde, nep), ue.dtype),
        interpret=interpret,
    )(uet, R, Wt, *pvals)
    return out[:, :ne].T.reshape(ne, nde, nde)


def supports_fused(intg, s: int = 0) -> bool:
    """True when the integrator's tables admit the fused kernel for the
    (s, s) diagonal block: shared B (R/W present) and shared statics."""
    t = intg.tables
    if "R" not in t or f"{s}_{s}" not in t.get("W", {}):
        return False
    if len(intg.spaces) != 1:
        return False
    if intg.field_kinds:  # runtime fields would need per-element blocks
        return False
    if not all(v.shape[0] == 1 for v in t["static"].values()):
        return False
    w = np.asarray(t["w"])
    return bool(
        np.allclose(w, w[:1], rtol=0, atol=1e-12 * (abs(w).max() or 1))
    )


def element_jacobian_via_pallas(intg, ublocks, interpret: bool = False,
                                block: int = 512, tables=None):
    """Drop-in fused replacement for
    ``intg.element_matrices(intg.hess_state(ublocks), 0, 0)``.

    Pass ``tables`` explicitly inside jit so the tabulated tensors are jit
    arguments rather than embedded constants (same rule as the XLA path).
    """
    t = tables or intg.tables
    ne = t["edof"][0].shape[0]
    ue = intg.gather(0, ublocks[0], t)  # [ne, nd, vdim]
    ue2 = ue.transpose(0, 2, 1).reshape(ne, -1)
    params = {k: v[0] for k, v in t["static"].items()}  # [nq, k]
    # supports_fused() checked w is element-invariant
    wq = jnp.asarray(t["w"][0], dtype=ue2.dtype)
    n = intg.n_input
    nde = intg.vdim[0] * intg.nd[0]
    return fused_element_jacobian(
        ue2, t["R"][0], t["W"]["0_0"], wq, intg.f.energy, params,
        intg.nq, n, nde, block=block, interpret=interpret,
    )
