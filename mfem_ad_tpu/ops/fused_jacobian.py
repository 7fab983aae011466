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
(tests/test_tpu_smoke.py).  Performance at Q1/2D/262k elements:
6.4M elem/s for the first version (per-qp [64,4]x[4,blk] dots starving
the MXU + 1-D [blk] AD ops on one sublane), 11.4M after (a) a single
k = nq n^2 contraction per block and (b) batching the AD stage over
(qp, element) so elementwise ops run on [nq, blk] 2-D tiles — still
15x below the XLA path's 177.7M, whose megafused
[ne nq]-batched AD + [ne, nq n^2] @ [nq n^2, nde^2] GEMM saturates both
units.  blk > 512 exceeds even a raised 64 MB scoped-VMEM cap (the
row-HVP live set scales with blk).  The XLA route therefore stays the
default; opt in with MFEM_AD_TPU_FUSED=1 (see
integrator.element_jacobians).

Round-3 resolution of the "claimed win regime" (high order / 3D where
the Hq tensor is HBM-bound): the kernel CANNOT run there.  It contracts
with the precomputed W = (B (x) B) factor held in VMEM, and the
integrator only builds W where the W-GEMM route wins — in 3D/high order
it selects the direct per-qp B H B^T einsum route precisely because W
is impractically large, so ``supports_fused`` is False at every such
config (measured: p>=2/3D has no W table).  Serving that regime from
Pallas would mean a different kernel (per-qp B-contraction in VMEM),
not this one.  With the XLA einsum route already at ~19-29% of the
GEMM-lower-bound MFU there (BENCH_SWEEP on v5e, see README), the kernel
is DEMOTED to a tested reference implementation: the auto-route never
selects it, and ``MFEM_AD_TPU_FUSED=1`` remains an explicit opt-in for
the configs it supports.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_tile(hess_entries, nq, n, pnames, pks, uet_ref, Rm_ref,
                 Wtp_ref, *param_refs_and_out):
    """Hand-tiled closed-form variant: every 'scalar' of the energy's
    Hessian formula is a [nq, blk] TILE, with no vmap and no jnp.stack.

    Mosaic compiles vmapped/stacked per-point graphs to large padded
    relayouts (the vmap-closed variant below measured 7.5M elem/s with a
    107 MB scoped live set at blk=2048 vs XLA's 177M at the p1/2D
    headline).  This variant hands it a straight-line program instead:
    ~50 full-tile VPU ops, one sublane concat, one GEMM.  Layouts are
    pre-permuted on the host so the kernel never transposes:
    - Rm rows are (m, q)-major  -> g_m = x[m*nq:(m+1)*nq] is contiguous;
    - Wtp columns are (a, b, q)-major -> Hall concat order matches.
    """
    param_refs = param_refs_and_out[:-1]
    out_ref = param_refs_and_out[-1]
    blk = uet_ref.shape[1]
    dt = uet_ref.dtype

    x = jnp.dot(Rm_ref[:], uet_ref[:], preferred_element_type=dt,
                precision=jax.lax.Precision.HIGHEST)  # [n*nq, blk]
    g = [x[m * nq:(m + 1) * nq, :] for m in range(n)]
    pt = {
        name: [ref[:][:, i:i + 1] for i in range(k)]
        for name, ref, k in zip(pnames, param_refs, pks)
    }
    rows = hess_entries(g, pt)
    slabs = [
        jnp.broadcast_to(jnp.asarray(rows[a][b], dt), (nq, blk))
        for a in range(n) for b in range(n)
    ]
    Hall = jnp.concatenate(slabs, axis=0)  # [(a,b,q) flat, blk]
    out_ref[:] = jnp.dot(
        Wtp_ref[:], Hall,
        preferred_element_type=dt,
        precision=jax.lax.Precision.HIGHEST,
    )


def _kernel_tile_blocked(hess_entries, nq, n, vdim, sd, nd, pnames, pks,
                         uet_ref, Rm_ref, W0tp_ref, *param_refs_and_out):
    """Blocked-W0 variant of ``_kernel_tile`` for pure-GRAD vector
    energies (n = vdim*sd): contracts per vdim-block pair with the
    W0 = b0 (x) b0 factor — vdim^2 fewer GEMM FLOPs than the full
    W = Bf (x) Bf (integrator cost model, integrator.py:741-836).  This
    is what serves the 3D / high-order regime the full-W kernel cannot
    reach (the integrator never builds full W there).  Output rows are
    (v, w, i, j)-major; the host-side wrapper permutes to the standard
    (v, i, w, j) element-matrix order outside the kernel."""
    param_refs = param_refs_and_out[:-1]
    out_ref = param_refs_and_out[-1]
    blk = uet_ref.shape[1]
    dt = uet_ref.dtype

    x = jnp.dot(Rm_ref[:], uet_ref[:], preferred_element_type=dt,
                precision=jax.lax.Precision.HIGHEST)  # [n*nq, blk]
    g = [x[m * nq:(m + 1) * nq, :] for m in range(n)]
    pt = {
        name: [ref[:][:, i:i + 1] for i in range(k)]
        for name, ref, k in zip(pnames, param_refs, pks)
    }
    rows = hess_entries(g, pt)
    for v in range(vdim):
        for w in range(vdim):
            slabs = [
                jnp.broadcast_to(
                    jnp.asarray(rows[v * sd + a][w * sd + b], dt),
                    (nq, blk),
                )
                for a in range(sd) for b in range(sd)
            ]
            Hblk = jnp.concatenate(slabs, axis=0)  # [(a,b,q), blk]
            vw = v * vdim + w
            out_ref[vw * nd * nd:(vw + 1) * nd * nd, :] = jnp.dot(
                W0tp_ref[:], Hblk,
                preferred_element_type=dt,
                precision=jax.lax.Precision.HIGHEST,
            )


def _kernel(energy, hess, nq, n, pnames, uet_ref, R_ref, Wt_ref,
            *param_refs_and_out):
    param_refs = param_refs_and_out[:-1]
    out_ref = param_refs_and_out[-1]
    blk = uet_ref.shape[1]
    dt = uet_ref.dtype

    # x[(q,m), e] = R[(q,m), i] ue[i, e]
    x = jnp.dot(R_ref[:], uet_ref[:], preferred_element_type=dt,
                precision=jax.lax.Precision.HIGHEST)
    x3 = x.reshape(nq, n, blk)  # leading-dim split: Mosaic-legal

    pall = {k: r[:] for k, r in zip(pnames, param_refs)}  # [nq, kparam]
    if hess is not None:
        # Closed-form per-qp Hessian (ad.py hessian_closed): pure scalar
        # arithmetic with ~5-10x fewer FLOPs than the HVP sweep below and
        # a live set of a handful of [nq, blk] tiles — no n-fold tangent
        # blowup, so the block size is VMEM-bound by Hq itself and can be
        # 4x larger.  Round-5 note: OUTSIDE a fused kernel this same
        # closed form LOSES to jacfwd (the stacked-H relayout at the XLA
        # kernel boundary, BENCH_SWEEP round-5 addendum); here there is
        # no boundary — Hq never leaves VMEM.
        Hq = jax.vmap(  # over qps (axis 0 of x3 and of each param)
            jax.vmap(hess, in_axes=(1, None), out_axes=2),  # elem lanes
            in_axes=(0, 0), out_axes=0,
        )(x3, pall)  # [nq, n, n, blk]
        Hall = Hq.reshape(nq * n * n, blk)
        out_ref[:] = jnp.dot(
            Wt_ref[:], Hall,
            preferred_element_type=dt,
            precision=jax.lax.Precision.HIGHEST,
        )
        return

    # Batch the AD stage over BOTH the element-lane axis and the qp axis:
    # the scalar-unrolled energy graphs turn every elementwise AD op into
    # an op on a [nq, blk] 2-D tile (qp on sublanes, elements on lanes).
    # The earlier per-qp loop ran the same ops on 1-D [blk] vectors, which
    # Mosaic lays out on a single sublane — 1/8 of the VPU.  To keep the
    # live-intermediate set within VMEM, compute the Hessian one ROW at a
    # time (n Hessian-vector products with basis tangents) instead of one
    # jacfwd-of-grad (whose n simultaneous tangents multiply every live
    # intermediate by n — measured 71.7 MB scoped VMEM vs the ~64 MB cap).
    grad_e = jax.grad(energy)

    def hvp(j, xq, pq):  # xq [n] one point; row j of its Hessian
        ej = [jnp.zeros((), dt)] * n
        ej[j] = jnp.ones((), dt)
        _, hj = jax.jvp(lambda xx: grad_e(xx, pq), (xq,),
                        (jnp.stack(ej),))
        return hj  # [n]

    rows = []
    for j in range(n):
        row = jax.vmap(  # over qps (axis 0 of x3 and of each param)
            jax.vmap(lambda xq, pq, j=j: hvp(j, xq, pq),
                     in_axes=(1, None), out_axes=1),  # over element lanes
            in_axes=(0, 0), out_axes=0,
        )(x3, pall)  # [nq, n, blk]
        rows.append(row)
    Hq = jnp.stack(rows, axis=1)  # [nq, n(row), n, blk]
    Hall = Hq.reshape(nq * n * n, blk)  # leading-dim merge: Mosaic-legal
    # Contract with ONE k = nq*n*n dot (quadrature weights pre-folded into
    # Wt on the host): nq tiny k=n*n dots ran the MXU at ~12% of a k-tile
    # and benched 28x slower than the XLA path.
    out_ref[:] = jnp.dot(
        Wt_ref[:],
        Hall,
        preferred_element_type=dt,
        precision=jax.lax.Precision.HIGHEST,
    )


def fused_element_jacobian(
    ue, R, W, wq, energy, params, nq: int, n: int, nde: int,
    block: int = 512, interpret: bool = False, hess=None,
    hess_entries=None, W0=None, vdim=None, sd=None, nd=None,
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
    blocked = (
        hess_entries is not None and W0 is not None
        and vdim is not None and n == vdim * sd
    )
    grid = (nep // block,)
    if blocked:
        # blocked-W0 tile kernel: fold w into W0 rows ((q,a,b)-flat),
        # transpose, and column-permute to the kernel's (a,b,q) order
        W0 = jnp.asarray(W0)
        wrep = jnp.repeat(jnp.asarray(wq, W0.dtype), sd * sd)
        W0t = (W0 * wrep[:, None]).T  # [nd*nd, nq*sd*sd]
        cperm = np.asarray(
            [q * sd * sd + ab for ab in range(sd * sd) for q in range(nq)]
        )
        Wt = W0t[:, cperm]
    else:
        # fold the (element-invariant) quadrature weights into the
        # contraction factor so the kernel needs no small-vector broadcast
        wrep = jnp.repeat(jnp.asarray(wq, W.dtype), n * n)  # [nq*n*n]
        Wt = (W * wrep[:, None]).T  # [nde*nde, nq*n*n]
    if hess_entries is not None:
        # host-side layout pre-permutations for the tile kernels
        rperm = np.asarray(
            [q * n + m for m in range(n) for q in range(nq)]
        )
        R = jnp.asarray(R)[rperm]  # (m, q)-major rows
        pks = tuple(int(v.shape[1]) for v in pvals)
        if blocked:
            kernel = functools.partial(
                _kernel_tile_blocked, hess_entries, nq, n, vdim, sd, nd,
                pnames, pks,
            )
        else:
            cperm = np.asarray(
                [q * n * n + ab for ab in range(n * n) for q in range(nq)]
            )
            Wt = Wt[:, cperm]  # (a, b, q)-major columns
            kernel = functools.partial(
                _kernel_tile, hess_entries, nq, n, pnames, pks
            )
    else:
        kernel = functools.partial(_kernel, energy, hess, nq, n, pnames)
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
        **({} if interpret else {
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        }),
    )(uet, R, Wt, *pvals)
    if blocked:
        # kernel rows are (v, w, i, j)-major; permute to (v, i, w, j)
        return (
            out[:, :ne].T
            .reshape(ne, vdim, vdim, nd, nd)
            .transpose(0, 1, 3, 2, 4)
            .reshape(ne, nde, nde)
        )
    return out[:, :ne].T.reshape(ne, nde, nde)


def supports_fused(intg, s: int = 0) -> bool:
    """True when the integrator's tables admit the fused kernel for the
    (s, s) diagonal block: shared B (R plus a W or blocked-W0 factor) and
    shared statics.  W0-only configs (3D / high order, where the
    integrator never builds full W) are admitted only for the blocked
    tile kernel: closed-form entries and a pure-GRAD vector layout."""
    t = intg.tables
    if "R" not in t:
        return False
    has_w = f"{s}_{s}" in t.get("W", {})
    has_w0 = (
        f"{s}_{s}" in t.get("W0", {})
        and getattr(intg.f, "hessian_closed_entries", None) is not None
        and intg.n_input == intg.vdim[s] * intg.sd[s]
    )
    if not (has_w or has_w0):
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
                                block: int | None = None, tables=None):
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
    # Route preference: hand-tiled closed-form entries (the only form
    # Mosaic compiles well) > vmapped closed form > generic HVP sweep
    # (works for any energy).  MFEM_AD_TPU_FUSED_AD=1 forces the HVP
    # path; MFEM_AD_TPU_FUSED_VMAP=1 forces the vmap-closed path (for
    # A/B reproduction — it measured 7.5M elem/s, see _kernel_tile).
    import os

    hess_entries = getattr(intg.f, "hessian_closed_entries", None)
    hess = getattr(intg.f, "hessian_closed", None)
    if os.environ.get("MFEM_AD_TPU_FUSED_VMAP") == "1":
        hess_entries = None
    if os.environ.get("MFEM_AD_TPU_FUSED_AD") == "1":
        hess_entries = hess = None
    closed = hess_entries is not None or hess is not None
    if block is None:
        block = int(os.environ.get(
            "MFEM_AD_TPU_FUSED_BLOCK", 4096 if closed else 512
        ))
    W = t.get("W", {}).get("0_0")
    W0 = t.get("W0", {}).get("0_0")
    # blocked-W0 wins vdim^2 GEMM FLOPs wherever the integrator's cost
    # model built W0 (it only builds it where blocked beats full); the
    # full-W kernel is the fallback (and the only choice for vmap/HVP
    # modes, which need the single flat contraction).
    if W0 is None or hess_entries is None or n != intg.vdim[0] * intg.sd[0]:
        W0 = None
        if W is None:
            raise ValueError(
                "fused kernel needs a full W table for this mode "
                "(supports_fused admits W0-only configs only with "
                "closed-form entries)"
            )
    return fused_element_jacobian(
        ue2, t["R"][0], W, wq, intg.f.energy, params,
        intg.nq, n, nde, block=block, interpret=interpret, hess=hess,
        hess_entries=hess_entries, W0=W0, vdim=intg.vdim[0],
        sd=intg.sd[0], nd=intg.nd[0],
    )
