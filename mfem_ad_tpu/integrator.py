"""Batched AD assembly: energy, residual, Jacobian from a point energy.

TPU-native redesign of the reference's AD integrators
(/root/reference/src/_ad_intg.hpp, src/ad_intg.hpp).  The reference's
per-element virtual dispatch + per-qp dual-number loops become three batched
tensor programs over ``[n_elem, n_qp]``:

- energy      = sum_eq f(B^T u) * w                 (GetElementEnergy,
                ad_intg.hpp:157-199)
- residual    = scatter(B (grad f) w)               (AssembleElementVector,
                ad_intg.hpp:202-257)
- Jacobian    = B H B^T w, applied matrix-free or as element blocks
                (AssembleElementGrad, ad_intg.hpp:260-334)

A single ``ADBlockIntegrator`` covers both the single-space integrator
(``ADNonlinearFormIntegrator<mode>``) and the multi-space block integrator
(``ADBlockNonlinearFormIntegrator<modes...>``, ad_intg.hpp:363-729): one
space is just a one-block system.  The per-qp stacked input layout matches
the reference exactly (see adeval.py).

The per-qp Hessian tensor ``Hq = w * d2f/dx2 [ne, nq, n, n]`` is the
"assembled state" of a Newton iterate: computing it once and applying
``v -> scatter(B (Hq (B^T v)))`` is partial assembly — the TPU-idiomatic
replacement for assembling a global sparse matrix.

All compute methods take the array bundle ``tables`` explicitly (defaulting
to ``self.tables``) so ``parallel.ShardedForm`` can shard the element axis
across a device mesh with ``shard_map`` and reduce with ``psum``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .ad import ADFunction
from .adeval import ADEval, build_B, shapedim
from .coefficients import (
    Coefficient,
    GridFunctionCoefficient,
    QPContext,
    ScalarFieldCoefficient,
)
from .fespace import FESpace
from .geometry import geom_factors
from .quadrature import default_ad_order, get_rule


def qpmap(fn):
    """vmap a per-qp function over [ne, nq] leading dims (pytree-aware)."""
    return jax.vmap(jax.vmap(fn))




class ADBlockIntegrator:
    """Domain integrator of a scalar energy over one or more FE spaces.

    Args:
        f: the ADFunction energy (its ``params`` coefficients are evaluated
           here; GridFunction/ScalarField-backed ones become runtime fields).
        spaces: list of FESpace, one per block.
        modes: list of ADEval, one per space.
        ir_order: quadrature order (default 2*max(p)+2, _ad_intg.hpp:104).
        dtype: computation dtype for the tabulated tensors.

    Array state lives in ``self.tables`` (a pytree):
        B:      tuple of [ne, nq, nd_s, sd_s]
        w:      [ne, nq]
        edof:   tuple of [ne, nd_s] int32
        static: dict name -> [ne, nq, k]      (static coefficient values)
        field:  dict name -> field-eval arrays (gf: (edof, phi))
    """

    def __init__(
        self,
        f: ADFunction,
        spaces,
        modes,
        ir_order: int | None = None,
        dtype=None,
    ):
        if isinstance(spaces, FESpace):
            spaces = [spaces]
        if isinstance(modes, ADEval):
            modes = [modes]
        assert len(spaces) == len(modes)
        self.f = f
        self.spaces = list(spaces)
        self.modes = list(modes)
        mesh = spaces[0].mesh
        for s in spaces:
            if s.mesh is not mesh:
                raise ValueError("all spaces must share one mesh")
        self.mesh = mesh
        if ir_order is None:
            ir_order = default_ad_order(max(s.order for s in spaces))
        self.ir = get_rule(mesh.geom, ir_order)
        gf = geom_factors(mesh, self.ir)
        self.xq_np = gf.xq
        dtype = dtype or jnp.zeros(0).dtype  # respects jax_enable_x64
        self.dtype = dtype

        self.nq = self.ir.npoints
        sdim = mesh.dim
        self.sd = [shapedim(m, sdim) for m in modes]
        self.vdim = [s.vdim for s in spaces]
        self.nd = [s.nd for s in spaces]
        self.nds = [s.ndof_scalar for s in spaces]
        self.widths = [sd * v for sd, v in zip(self.sd, self.vdim)]
        self.x_off = np.concatenate([[0], np.cumsum(self.widths)])
        self.n_input = int(self.x_off[-1])
        if self.n_input != f.n_input:
            raise ValueError(
                f"energy n_input={f.n_input} but input layout has width "
                f"{self.n_input} (widths per space: {self.widths})"
            )
        for s, m in zip(spaces, modes):
            if s.vdim > 1 and not (m & ADEval.VECTOR):
                raise ValueError("vdim > 1 requires ADEval.VECTOR")

        B = tuple(
            jnp.asarray(build_B(s, m, self.ir, gf), dtype=dtype)
            for s, m in zip(spaces, modes)
        )
        w = jnp.asarray(gf.w, dtype=dtype)
        edof = tuple(jnp.asarray(s.edof, dtype=jnp.int32) for s in spaces)

        # ---- parameters: static (tabulated now) vs field-backed (traced)
        static: dict[str, jnp.ndarray] = {}
        fieldtab: dict[str, tuple] = {}
        self.field_kinds: dict[str, tuple] = {}
        ctx = QPContext(self.xq_np, ir=self.ir, mesh=mesh)
        for name, coeff in f.params.items():
            if isinstance(coeff, GridFunctionCoefficient):
                sp = coeff.space
                if sp.mesh is not self.mesh:
                    raise ValueError(
                        f"field {name!r} lives on a different mesh"
                    )
                phi = jnp.asarray(
                    sp.elem.eval(self.ir.points), dtype=self.dtype
                )
                fieldtab[name] = (
                    jnp.asarray(sp.edof, dtype=jnp.int32),
                    phi,
                )
                self.field_kinds[name] = ("gf", sp.vdim, sp.ndof_scalar)
            elif isinstance(coeff, ScalarFieldCoefficient):
                self.field_kinds[name] = ("scalar", coeff.size)
            else:
                vals = np.asarray(coeff.eval_qp(ctx))
                static[name] = jnp.asarray(vals, dtype=self.dtype)

        self.tables = {
            "B": B,
            "w": w,
            "edof": edof,
            "static": static,
            "field": fieldtab,
        }

    # ------------------------------------------------------------------
    # core compute (pure in `tables`; safe to call inside shard_map)
    # ------------------------------------------------------------------
    def eval_params(self, fields: dict, tables=None) -> dict:
        t = tables or self.tables
        ne, nq = t["w"].shape
        p = dict(t["static"])
        for name, kind in self.field_kinds.items():
            if name not in fields:
                raise KeyError(
                    f"assembly requires field {name!r}; got {list(fields)}"
                )
            if kind[0] == "gf":
                _, vdim, nsc = kind
                edof, phi = t["field"][name]
                u = jnp.asarray(fields[name], dtype=self.dtype)
                idx = edof[:, :, None] + jnp.arange(vdim) * nsc
                ue = u[idx]  # [ne, nd, vdim]
                p[name] = jnp.einsum("qd,edv->eqv", phi, ue)
            else:
                _, size = kind
                v = jnp.atleast_1d(jnp.asarray(fields[name], dtype=self.dtype))
                p[name] = jnp.broadcast_to(v, (ne, nq, size))
        return p

    def gather(self, s: int, u, tables=None):
        """Element dofs of block s: [ne, nd, vdim] (byNODES layout)."""
        t = tables or self.tables
        idx = t["edof"][s][:, :, None] + jnp.arange(self.vdim[s]) * self.nds[s]
        return jnp.asarray(u, dtype=self.dtype)[idx]

    def scatter(self, s: int, re, tables=None):
        """Scatter-add element values [ne, nd, vdim] into block-s dofs."""
        t = tables or self.tables
        idx = t["edof"][s][:, :, None] + jnp.arange(self.vdim[s]) * self.nds[s]
        out = jnp.zeros(self.spaces[s].ndof, dtype=re.dtype)
        return out.at[idx].add(re)

    def x_qp(self, ublocks, tables=None) -> jnp.ndarray:
        """Stacked per-qp input x [ne, nq, n_input] (x = B^T u per space,
        component-major within a space — ad_intg.hpp:242,:304)."""
        t = tables or self.tables
        ne, nq = t["w"].shape
        xs = []
        for s in range(len(self.spaces)):
            ue = self.gather(s, ublocks[s], t)
            x = jnp.einsum("eqds,edv->eqvs", t["B"][s], ue)
            xs.append(x.reshape(ne, nq, self.widths[s]))
        return jnp.concatenate(xs, axis=-1)

    def spread(self, g, s: int):
        """Slice the per-qp segment of space s: [ne, nq, vdim, sd]."""
        seg = g[..., self.x_off[s] : self.x_off[s + 1]]
        return seg.reshape(g.shape[0], g.shape[1], self.vdim[s], self.sd[s])

    # ------------------------------------------------------------------
    def energy(self, ublocks, fields=None, tables=None):
        t = tables or self.tables
        x = self.x_qp(ublocks, t)
        p = self.eval_params(fields or {}, t)
        vals = qpmap(self.f.energy)(x, p)
        return jnp.sum(vals * t["w"])

    def residual(self, ublocks, fields=None, tables=None):
        """Per-block residual vectors: r_s = scatter(B_s (grad f) w)."""
        t = tables or self.tables
        x = self.x_qp(ublocks, t)
        p = self.eval_params(fields or {}, t)
        g = qpmap(jax.grad(self.f.energy))(x, p) * t["w"][..., None]
        return [
            self.scatter(
                s, jnp.einsum("eqds,eqvs->edv", t["B"][s], self.spread(g, s)), t
            )
            for s in range(len(self.spaces))
        ]

    def hess_state(self, ublocks, fields=None, tables=None):
        """Per-qp weighted Hessian Hq [ne, nq, n, n] — the Newton state."""
        t = tables or self.tables
        x = self.x_qp(ublocks, t)
        p = self.eval_params(fields or {}, t)
        H = qpmap(jax.jacfwd(jax.grad(self.f.energy)))(x, p)
        return H * t["w"][..., None, None]

    def hess_mult(self, Hq, vblocks, tables=None):
        """Matrix-free J v: scatter(B (Hq (B^T v)))."""
        t = tables or self.tables
        xv = self.x_qp(vblocks, t)
        Hxv = jnp.einsum("eqnm,eqm->eqn", Hq, xv)
        return [
            self.scatter(
                s,
                jnp.einsum("eqds,eqvs->edv", t["B"][s], self.spread(Hxv, s)),
                t,
            )
            for s in range(len(self.spaces))
        ]

    def diagonal(self, Hq, tables=None):
        """Per-block diagonal of the assembled Jacobian (for Jacobi PC)."""
        t = tables or self.tables
        ne, nq = t["w"].shape
        out = []
        for s in range(len(self.spaces)):
            o = self.x_off[s]
            blk = Hq[..., o : o + self.widths[s], o : o + self.widths[s]]
            H6 = blk.reshape(
                ne, nq, self.vdim[s], self.sd[s], self.vdim[s], self.sd[s]
            )
            Hvv = jnp.diagonal(H6, axis1=2, axis2=4)  # [ne,nq,sd,sd,vdim]
            D = jnp.einsum("eqds,eqstv,eqdt->edv", t["B"][s], Hvv, t["B"][s])
            out.append(self.scatter(s, D, t))
        return out

    def element_matrices(self, Hq, s: int, t_: int, tables=None):
        """Dense element blocks A_e[(v,d),(w,k)] for pair (test s, trial t_).

        Matches the reference's block slicing + MyAddMultABt accumulation
        (ad_intg.hpp:700-727); byNODES flat layout (v*nd + d).
        """
        t = tables or self.tables
        ne, nq = t["w"].shape
        os_, ot = self.x_off[s], self.x_off[t_]
        blk = Hq[..., os_ : os_ + self.widths[s], ot : ot + self.widths[t_]]
        H6 = blk.reshape(
            ne, nq, self.vdim[s], self.sd[s], self.vdim[t_], self.sd[t_]
        )
        A = jnp.einsum("eqds,eqvswt,eqkt->evdwk", t["B"][s], H6, t["B"][t_])
        return A.reshape(
            ne, self.vdim[s] * self.nd[s], self.vdim[t_] * self.nd[t_]
        )

    def assemble_dense_block(self, Hq, s: int, t_: int) -> np.ndarray:
        """Assembled dense [N_s, N_t] block (small problems / tests)."""
        Ae = np.asarray(self.element_matrices(Hq, s, t_))
        sp_s, sp_t = self.spaces[s], self.spaces[t_]
        idx_s = np.asarray(self.tables["edof"][s])[:, :, None] + np.arange(
            sp_s.vdim
        ) * sp_s.ndof_scalar  # [ne, nd, vdim]
        idx_t = np.asarray(self.tables["edof"][t_])[:, :, None] + np.arange(
            sp_t.vdim
        ) * sp_t.ndof_scalar
        # byNODES element layout: flat (v, d) = v*nd + d
        ne = Ae.shape[0]
        gi = np.transpose(idx_s, (0, 2, 1)).reshape(ne, -1)
        gj = np.transpose(idx_t, (0, 2, 1)).reshape(ne, -1)
        A = np.zeros((sp_s.ndof, sp_t.ndof))
        np.add.at(A, (gi[:, :, None], gj[:, None, :]), Ae)
        return A

    # ------------------------------------------------------------------
    def padded_tables(self, n_shards: int):
        """Copy-pad the element axis to a multiple of ``n_shards``.

        Padded elements replicate element 0 with zero quadrature weight, so
        every contribution vanishes while the energy evaluation stays in the
        function's domain (no NaN from out-of-domain zero inputs).
        """
        t = self.tables
        ne = t["w"].shape[0]
        pad = (-ne) % n_shards
        if pad == 0:
            return t

        def padel(a):
            rep = jnp.repeat(a[:1], pad, axis=0)
            return jnp.concatenate([a, rep], axis=0)

        w = jnp.concatenate(
            [t["w"], jnp.zeros((pad, t["w"].shape[1]), t["w"].dtype)], axis=0
        )
        return {
            "B": tuple(padel(b) for b in t["B"]),
            "w": w,
            "edof": tuple(padel(e) for e in t["edof"]),
            "static": {k: padel(v) for k, v in t["static"].items()},
            "field": {
                k: (padel(ed), phi) for k, (ed, phi) in t["field"].items()
            },
        }
