"""GLVis live-visualization client — reference src/logger.hpp:54-116,
src/logger.cpp:113-259.

Speaks the GLVis socket protocol: connects to a running ``glvis`` server
(default localhost:19916) and streams ``solution`` blocks (MFEM mesh +
grid function in MFEM ASCII formats).  Fields of arbitrary order are sent
as order-1 interpolants at mesh vertices (like utils.vtk).  If no server is
listening the client degrades to a no-op, so examples can always construct
one (the reference would fail the socket and silently skip).
"""

from __future__ import annotations

import socket

import numpy as np

from ..fespace import FESpace
from ..mesh import Mesh
from ..quadrature import CUBE, SQUARE, TRIANGLE
from .vtk import _corner_values

_MFEM_GEOM_CODE = {TRIANGLE: 2, SQUARE: 3, CUBE: 5}
# lex corners -> MFEM counter-clockwise ordering
_MFEM_PERM = {TRIANGLE: [0, 1, 2], SQUARE: [0, 1, 3, 2],
              CUBE: [0, 1, 3, 2, 4, 5, 7, 6]}


def _mesh_ascii(mesh: Mesh) -> str:
    lines = ["MFEM mesh v1.0", "", "dimension", str(mesh.dim), ""]
    lines += ["elements", str(mesh.num_elements)]
    code = _MFEM_GEOM_CODE[mesh.geom]
    perm = _MFEM_PERM[mesh.geom]
    for attr, el in zip(mesh.attributes, mesh.elements):
        lines.append(
            f"{int(attr)} {code} " + " ".join(str(int(el[p])) for p in perm)
        )
    lines += ["", "boundary", str(mesh.bdr_elements.shape[0])]
    bcode = 1 if mesh.dim == 2 else 3
    bperm = [0, 1] if mesh.dim == 2 else [0, 1, 3, 2]
    for attr, be in zip(mesh.bdr_attributes, mesh.bdr_elements):
        lines.append(
            f"{int(attr)} {bcode} " + " ".join(str(int(be[p])) for p in bperm)
        )
    lines += ["", "vertices", str(mesh.num_vertices), str(mesh.dim)]
    for v in mesh.vertices:
        lines.append(" ".join(f"{x:.16g}" for x in v))
    return "\n".join(lines) + "\n"


def _gridfunction_ascii(space: FESpace, u: np.ndarray) -> str:
    vals = _corner_values(space, u)  # [nv, vdim]
    lines = [
        "FiniteElementSpace",
        "FiniteElementCollection: H1_{}D_P1".format(space.mesh.dim),
        f"VDim: {space.vdim}",
        "Ordering: 1",
        "",
    ]
    for row in vals:
        lines.append(" ".join(f"{x:.16g}" for x in row))
    return "\n".join(lines) + "\n"


class GLVis:
    """Multi-window GLVis client (Append/Update API of logger.hpp:54-116)."""

    def __init__(self, host: str = "localhost", port: int = 19916,
                 w: int = 400, h: int = 350, max_windows: int = 8):
        self.host, self.port = host, port
        self.w, self.h = w, h
        self._fields: list[tuple[FESpace, str, str]] = []
        self._data: list[np.ndarray] = []
        self._enabled = self._probe()

    def _probe(self) -> bool:
        try:
            with socket.create_connection((self.host, self.port), timeout=0.2):
                return True
        except OSError:
            return False

    def append(self, space: FESpace, u, name: str = "", keys: str = "Rjc"):
        self._fields.append((space, name, keys))
        self._data.append(np.asarray(u))
        return len(self._fields) - 1

    def set_data(self, i: int, u):
        self._data[i] = np.asarray(u)

    def update(self):
        if not self._enabled:
            return
        for i, ((space, name, keys), u) in enumerate(
            zip(self._fields, self._data)
        ):
            try:
                with socket.create_connection(
                    (self.host, self.port), timeout=1.0
                ) as s:
                    msg = (
                        "solution\n"
                        + _mesh_ascii(space.mesh)
                        + _gridfunction_ascii(space, u)
                    )
                    if name:
                        msg += f"window_title '{name}'\n"
                    x = (i % 4) * self.w
                    y = (i // 4) * self.h
                    msg += f"window_geometry {x} {y} {self.w} {self.h}\n"
                    if keys:
                        msg += f"keys {keys}\n"
                    s.sendall(msg.encode())
            except OSError:
                self._enabled = False
                return
