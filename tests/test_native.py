"""Native meshkit (C++/ctypes) vs numpy fallback equivalence."""

import shutil

import numpy as np
import pytest

from mfem_ad_tpu import native


def test_native_builds_when_toolchain_present():
    """The equivalence tests below silently degrade to numpy-vs-numpy when
    the .so is missing, so a broken C++ build must fail HERE, loudly.
    (Round-1 regression: a committed stale binary masked a compile error
    in unique_rows_k4 for months of build time.)"""
    if shutil.which("g++") is None and shutil.which("c++") is None:
        pytest.skip("no C++ toolchain")
    assert native.available(), (
        "C++ toolchain present but native meshkit failed to build/load; "
        "run `make -C native` to see the compiler error"
    )


def test_unique_rows_matches_numpy():
    rng = np.random.default_rng(3)
    rows = rng.integers(0, 50, size=(4000, 2)).astype(np.int64)
    u_np, inv_np = np.unique(rows, axis=0, return_inverse=True)
    u_nat, inv_nat = native.unique_rows(rows)
    assert np.array_equal(u_np, u_nat)
    assert np.array_equal(np.asarray(inv_np).ravel(), inv_nat)
    # reconstruction property
    assert np.array_equal(u_nat[inv_nat], rows)


def test_unique_rows_wide():
    rng = np.random.default_rng(4)
    rows = rng.integers(0, 9, size=(2000, 4)).astype(np.int64)
    u_np, inv_np = np.unique(rows, axis=0, return_inverse=True)
    u_nat, inv_nat = native.unique_rows(rows)
    assert np.array_equal(u_np, u_nat)
    assert np.array_equal(np.asarray(inv_np).ravel(), inv_nat)


def test_edge_dofs_matches_python():
    rng = np.random.default_rng(5)
    n = 1000
    a = rng.integers(0, 100, n)
    b = rng.integers(0, 100, n)
    b = np.where(b == a, b + 1, b)
    eid = rng.integers(0, 300, n)
    p, npe, off = 4, 3, 77
    for kk in range(1, p):
        ref = off + eid * npe + (np.where(a < b, kk, p - kk) - 1)
        out = native.edge_dofs(a, b, eid, off, npe, p, kk)
        assert np.array_equal(ref, out)


def test_h1_space_same_with_and_without_native(monkeypatch):
    """The FE space built through the native path must match the numpy
    fallback exactly (dof numbering is relabeled deterministically)."""
    import importlib

    from mfem_ad_tpu import mesh as M
    from mfem_ad_tpu.fespace import FESpace

    m = M.make_cartesian_2d(5, 4).uniform_refine(1)
    sp1 = FESpace(m, 3)
    monkeypatch.setenv("MFEM_AD_TPU_NO_NATIVE", "1")
    native._lib = None
    native._tried = False
    try:
        assert not native.available()
        sp2 = FESpace(m, 3)
    finally:
        native._lib = None
        native._tried = False
        monkeypatch.delenv("MFEM_AD_TPU_NO_NATIVE")
    assert np.array_equal(np.asarray(sp1.edof), np.asarray(sp2.edof))
    assert np.allclose(sp1.node_coords, sp2.node_coords)
    assert np.array_equal(sp1.boundary_dofs(), sp2.boundary_dofs())
