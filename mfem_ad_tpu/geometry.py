"""Element geometry factors: Jacobians, physical gradients, quadrature weights.

The batched-array equivalent of MFEM's ``ElementTransformation`` calls made
per quadrature point in the reference's hot loop
(``CalcPhysDShape``/``Tr.Weight()``, /root/reference/src/ad_intg.hpp:119-154,
:237): everything is tabulated once per (mesh, rule) as dense
``[n_elem, n_qp, ...]`` arrays that jitted assembly kernels consume.

Host-side numpy float64; the isoparametric map uses the order-1 basis on the
lexicographic corner ordering (see mesh.py), i.e. straight/bi-/tri-linear
elements, which covers every mesh the reference uses.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .basis import ref_element
from .mesh import Mesh
from .quadrature import IntegrationRule


@dataclass
class GeomFactors:
    xq: np.ndarray  # [ne, nq, dim] physical quadrature points
    jac: np.ndarray  # [ne, nq, dim, dim] J[k,m] = dx_k/dxi_m
    detj: np.ndarray  # [ne, nq]
    invj: np.ndarray  # [ne, nq, dim, dim] J^{-1}
    w: np.ndarray  # [ne, nq] detJ * quadrature weight (Tr.Weight()*ip.weight)


def geom_factors(mesh: Mesh, ir: IntegrationRule) -> GeomFactors:
    geo = ref_element(mesh.geom, 1)
    N = geo.eval(ir.points)  # [nq, nc]
    dN = geo.grad(ir.points)  # [nq, nc, dim]
    corners = mesh.corner_coords()  # [ne, nc, dim]
    xq = np.einsum("qc,eck->eqk", N, corners)
    jac = np.einsum("qcm,eck->eqkm", dN, corners)
    detj = np.linalg.det(jac)
    if np.any(detj <= 0):
        raise ValueError("non-positive element Jacobian (inverted element)")
    invj = np.linalg.inv(jac)
    w = detj * ir.weights[None, :]
    return GeomFactors(xq=xq, jac=jac, detj=detj, invj=invj, w=w)


def phys_dshape(
    mesh: Mesh, ir: IntegrationRule, order: int, gf: GeomFactors | None = None
) -> np.ndarray:
    """Physical-space shape gradients [ne, nq, nd, dim] (CalcPhysDShape)."""
    if gf is None:
        gf = geom_factors(mesh, ir)
    fe = ref_element(mesh.geom, order)
    dphi = fe.grad(ir.points)  # [nq, nd, m] reference gradients
    return np.einsum("qdm,eqmk->eqdk", dphi, gf.invj)
