"""DOF-level proximal Galerkin — reference src/{_dof_pg,dof_pg}.hpp.

The "DOF" variant applies the entropy coupling pointwise at the FE **nodal
points** instead of at quadrature points (dof_pg.hpp:49,113,210), which
makes every coupling block diagonal:

- primal residual += (psi_j - psi_k_j) w_j / alpha      (dof_pg.hpp:124)
- dual residual    = (u_j - dE*(psi_j)) w_j / alpha     (dof_pg.hpp:125)
- Jacobian: dual-dual diag(-E*''(psi_j) w_j / alpha), primal-dual and
  dual-primal diag(w_j / alpha)                          (dof_pg.hpp:226-228)

The objective f(u) is delegated to the ordinary block integrator on the
primal spaces only (dof_pg.hpp:33-34,:96-97,:193-194).  Primal and dual
spaces must have identical element dof counts (dof_pg.hpp:46-48).

Nodal weights: the reference uses ``fe.GetNodes()`` integration-point
weights; here w_j = detJ(node_j) * wref_j with wref_j = ∫ φ_j the
interpolatory (lumped/GLL) quadrature weight of node j — the well-defined
TPU-native realization of nodal quadrature.

``DofPGIntegrator`` implements the same integrator protocol as
``ADBlockIntegrator`` (residual/hess_state/hess_mult/diagonal/
element_matrices over explicit ``tables``), so it plugs into
``BlockNonlinearForm`` and ``parallel.ShardedForm`` unchanged.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .adeval import ADEval
from .basis import ref_element
from .coefficients import GridFunctionCoefficient, ScalarFieldCoefficient
from .fespace import FESpace
from .geometry import geom_factors
from .coefficients import QPContext
from .integrator import ADBlockIntegrator
from .pg import ADEntropy
from .quadrature import IntegrationRule, get_rule


def _nodal_weights(space: FESpace) -> np.ndarray:
    """Interpolatory nodal quadrature weights wref_j = ∫_ref φ_j."""
    ir = get_rule(space.mesh.geom, 2 * space.order + 2)
    phi = space.elem.eval(ir.points)  # [nq, nd]
    return ir.weights @ phi  # [nd]


class DofPGIntegrator:
    """Nodal PG coupling for (primal, dual) space pairs + delegated objective.

    Args:
        objective: ADFunction on the primal spaces' stacked input.
        primal_spaces, primal_modes: as for ADBlockIntegrator.
        dual_spaces: one per primal space, same element dof count, scalar.
        entropies: one scalar ADEntropy per pair.
    """

    def __init__(
        self,
        objective,
        primal_spaces,
        primal_modes,
        dual_spaces,
        entropies,
        ir_order=None,
        dtype=None,
    ):
        if isinstance(primal_spaces, FESpace):
            primal_spaces = [primal_spaces]
        if isinstance(primal_modes, ADEval):
            primal_modes = [primal_modes]
        if isinstance(dual_spaces, FESpace):
            dual_spaces = [dual_spaces]
        if isinstance(entropies, ADEntropy):
            entropies = [entropies]
        assert len(primal_spaces) == len(dual_spaces) == len(entropies), (
            "all primal spaces must have an associated dual space "
            "(dof_pg.hpp:16-18)"
        )
        self.inner = ADBlockIntegrator(
            objective, primal_spaces, primal_modes, ir_order=ir_order,
            dtype=dtype,
        )
        self.dtype = self.inner.dtype
        self.primal_spaces = list(primal_spaces)
        self.dual_spaces = list(dual_spaces)
        self.entropies = list(entropies)
        self.spaces = self.primal_spaces + self.dual_spaces
        self.np_ = len(primal_spaces)
        mesh = primal_spaces[0].mesh

        wn, edof_p, edof_d, nodes_xq = [], [], [], []
        for ps, ds in zip(primal_spaces, dual_spaces):
            if ps.nd != ds.nd:
                raise ValueError(
                    "primal and dual elements must have the same dof count "
                    f"({ps.nd} != {ds.nd}) — dof_pg.hpp:46-48"
                )
            if ds.vdim != 1 or ps.vdim != 1:
                raise ValueError(
                    "DofPG coupling requires scalar primal/dual spaces"
                )
            nodes = ps.elem.nodes
            ir_nodes = IntegrationRule(mesh.geom, nodes, np.zeros(len(nodes)))
            gfac = geom_factors(mesh, ir_nodes)
            wref = _nodal_weights(ps)
            wn.append(
                jnp.asarray(gfac.detj * wref[None, :], dtype=self.dtype)
            )
            nodes_xq.append(gfac.xq)
            edof_p.append(jnp.asarray(ps.edof, dtype=jnp.int32))
            edof_d.append(jnp.asarray(ds.edof, dtype=jnp.int32))

        # entropy parameters evaluated at the nodal points (static only;
        # runtime alpha comes through fields)
        static = []
        for i, (e, xq) in enumerate(zip(entropies, nodes_xq)):
            ctx = QPContext(xq)
            p = {}
            for name, coeff in e.params.items():
                if isinstance(
                    coeff, (GridFunctionCoefficient, ScalarFieldCoefficient)
                ):
                    raise NotImplementedError(
                        "field-backed entropy parameters in DofPG"
                    )
                p[name] = jnp.asarray(coeff.eval_qp(ctx), dtype=self.dtype)
            static.append(p)

        self.tables = {
            "inner": self.inner.tables,
            "wn": tuple(wn),
            "edof_p": tuple(edof_p),
            "edof_d": tuple(edof_d),
            "static": tuple(static),
        }
        self.field_kinds = dict(self.inner.field_kinds)

    # -- helpers ---------------------------------------------------------
    def _latent_k_nodes(self, i, fields, t):
        lk = fields[f"latent_k{i}"]
        return jnp.asarray(lk, dtype=self.dtype)[t["edof_d"][i]]  # [ne, nd]

    def _entropy_d(self, i, psi, t):
        """E*', E*'' at nodal psi values [ne, nd]."""
        e = self.entropies[i]
        p = t["static"][i]

        def scalar(v, pj):
            return e.energy(jnp.array([v]), pj)

        d1 = jax.vmap(jax.vmap(jax.grad(scalar)))(psi, p)
        d2 = jax.vmap(jax.vmap(jax.grad(jax.grad(scalar))))(psi, p)
        return d1, d2

    def _alpha(self, fields):
        return jnp.asarray(fields["alpha"], dtype=self.dtype)

    # -- integrator protocol ----------------------------------------------
    def energy(self, ublocks, fields=None, tables=None, fast: bool = True):
        t = tables or self.tables
        fields = fields or {}
        e = self.inner.energy(ublocks[: self.np_], fields, t["inner"], fast)
        alpha = self._alpha(fields)
        pg = 0.0
        for i in range(self.np_):
            u = ublocks[i][t["edof_p"][i]]  # nodal primal values [ne, nd]
            psi = ublocks[self.np_ + i][t["edof_d"][i]]
            psik = self._latent_k_nodes(i, fields, t)
            estar = jax.vmap(
                jax.vmap(lambda v, pj: self.entropies[i].energy(
                    jnp.array([v]), pj
                ))
            )(psi, t["static"][i])
            pg = pg + jnp.sum((u * (psi - psik) - estar) * t["wn"][i])
        return e + pg / alpha

    def residual(self, ublocks, fields=None, tables=None, fast: bool = True):
        t = tables or self.tables
        fields = fields or {}
        rs = self.inner.residual(ublocks[: self.np_], fields, t["inner"], fast)
        alpha = self._alpha(fields)
        out_d = []
        for i in range(self.np_):
            w = t["wn"][i] / alpha
            u = ublocks[i][t["edof_p"][i]]
            psi = ublocks[self.np_ + i][t["edof_d"][i]]
            psik = self._latent_k_nodes(i, fields, t)
            d1, _ = self._entropy_d(i, psi, t)
            rp = (psi - psik) * w  # [ne, nd] into primal dofs
            rd = (u - d1) * w
            rs[i] = rs[i] + jnp.zeros_like(rs[i]).at[t["edof_p"][i]].add(rp)
            nd_dofs = self.dual_spaces[i].ndof
            out_d.append(
                jnp.zeros(nd_dofs, dtype=rd.dtype).at[t["edof_d"][i]].add(rd)
            )
        return rs + out_d

    def hess_state(self, ublocks, fields=None, tables=None, fast: bool = True,
                   sym: bool = False):
        t = tables or self.tables
        fields = fields or {}
        Hq = self.inner.hess_state(
            ublocks[: self.np_], fields, t["inner"], fast, sym=sym
        )
        alpha = self._alpha(fields)
        d2s = []
        for i in range(self.np_):
            psi = ublocks[self.np_ + i][t["edof_d"][i]]
            _, d2 = self._entropy_d(i, psi, t)
            d2s.append((t["wn"][i] / alpha, -d2 * t["wn"][i] / alpha))
        return (Hq, tuple(d2s))

    def hess_mult(self, state, vblocks, tables=None, fast: bool = True):
        t = tables or self.tables
        Hq, d2s = state
        ys = self.inner.hess_mult(Hq, vblocks[: self.np_], t["inner"], fast)
        out_d = []
        for i in range(self.np_):
            w, dd = d2s[i]
            vp = vblocks[i][t["edof_p"][i]]
            vd = vblocks[self.np_ + i][t["edof_d"][i]]
            ys[i] = ys[i] + jnp.zeros_like(ys[i]).at[t["edof_p"][i]].add(
                vd * w
            )
            rd = vp * w + vd * dd
            nd_dofs = self.dual_spaces[i].ndof
            out_d.append(
                jnp.zeros(nd_dofs, dtype=rd.dtype).at[t["edof_d"][i]].add(rd)
            )
        return ys + out_d

    def diagonal(self, state, tables=None, fast: bool = True):
        t = tables or self.tables
        Hq, d2s = state
        ds = self.inner.diagonal(Hq, t["inner"], fast)
        out_d = []
        for i in range(self.np_):
            _, dd = d2s[i]
            nd_dofs = self.dual_spaces[i].ndof
            out_d.append(
                jnp.zeros(nd_dofs, dtype=dd.dtype)
                .at[t["edof_d"][i]]
                .add(dd)
            )
        return ds + out_d

    def element_matrices(self, state, s, t_, tables=None):
        t = tables or self.tables
        Hq, d2s = state
        npq = self.np_

        def diagmats(vals):  # [ne, nd] -> [ne, nd, nd]
            nd = vals.shape[1]
            return vals[:, :, None] * jnp.eye(nd, dtype=vals.dtype)

        if s < npq and t_ < npq:
            A = self.inner.element_matrices(Hq, s, t_, t["inner"])
            if s == t_:
                # primal-primal has no nodal part (coupling is off-diagonal)
                pass
            return A
        ne = t["wn"][0].shape[0]
        if s < npq and t_ >= npq:
            i = t_ - npq
            if s == i:
                return diagmats(d2s[i][0])
            return jnp.zeros(
                (ne, self.spaces[s].nd * self.spaces[s].vdim, self.spaces[t_].nd)
            )
        if s >= npq and t_ < npq:
            i = s - npq
            if t_ == i:
                return diagmats(d2s[i][0])
            return jnp.zeros(
                (ne, self.spaces[s].nd, self.spaces[t_].nd * self.spaces[t_].vdim)
            )
        i, j = s - npq, t_ - npq
        if i == j:
            return diagmats(d2s[i][1])
        return jnp.zeros((ne, self.spaces[s].nd, self.spaces[t_].nd))

    def assemble_dense_block(self, state, s, t_):
        Ae = np.asarray(self.element_matrices(state, s, t_))
        sp_s, sp_t = self.spaces[s], self.spaces[t_]
        tb = self.tables
        edofs = list(tb["edof_p"]) + list(tb["edof_d"])
        idx_s = np.asarray(edofs[s], dtype=np.int64)[:, :, None] + np.arange(
            sp_s.vdim
        ) * sp_s.ndof_scalar
        idx_t = np.asarray(edofs[t_], dtype=np.int64)[:, :, None] + np.arange(
            sp_t.vdim
        ) * sp_t.ndof_scalar
        ne = Ae.shape[0]
        gi = np.transpose(idx_s, (0, 2, 1)).reshape(ne, -1)
        gj = np.transpose(idx_t, (0, 2, 1)).reshape(ne, -1)
        A = np.zeros((sp_s.ndof, sp_t.ndof))
        np.add.at(A, (gi[:, :, None], gj[:, None, :]), Ae)
        return A

    def padded_tables(self, n_shards: int):
        t = self.tables
        ne = t["wn"][0].shape[0]
        pad = (-ne) % n_shards
        inner = self.inner.padded_tables(n_shards)
        if pad == 0:
            return {**t, "inner": inner}

        def padel(a):
            return jnp.concatenate([a, jnp.repeat(a[:1], pad, axis=0)], axis=0)

        def padzero(a):
            z = jnp.zeros((pad,) + a.shape[1:], a.dtype)
            return jnp.concatenate([a, z], axis=0)

        return {
            "inner": inner,
            "wn": tuple(padzero(w) for w in t["wn"]),
            "edof_p": tuple(padel(e) for e in t["edof_p"]),
            "edof_d": tuple(padel(e) for e in t["edof_d"]),
            "static": tuple(
                {k: padel(v) for k, v in p.items()} for p in t["static"]
            ),
        }
