"""Checkpoint/resume for long LVPP runs — a strict superset of the
reference, which has none (SURVEY.md §5): save (u, psi_k, alpha, iter, ...)
as a .npz plus a JSON sidecar of scalars, so outer proximal loops can
resume."""

from __future__ import annotations

import json
import os

import numpy as np


def save_checkpoint(path: str, arrays: dict, meta: dict | None = None):
    """Save named arrays (+ JSON-serializable metadata) atomically."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
    os.replace(tmp, path if path.endswith(".npz") else path + ".npz")
    final = path if path.endswith(".npz") else path + ".npz"
    if meta is not None:
        with open(final + ".json", "w") as f:
            json.dump(meta, f, indent=1)
    return final


def load_checkpoint(path: str):
    """Returns (arrays: dict, meta: dict|None)."""
    final = path if path.endswith(".npz") else path + ".npz"
    with np.load(final) as z:
        arrays = {k: z[k] for k in z.files}
    meta = None
    if os.path.exists(final + ".json"):
        with open(final + ".json") as f:
            meta = json.load(f)
    return arrays, meta
