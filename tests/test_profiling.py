"""Tracing/profiling subsystem (SURVEY.md §5): per-phase cost table +
jax.profiler trace wrapper.  The reference has no counterpart (only
commented-out debug prints, reference pg.hpp:433,448-457)."""

import os
import time

import numpy as np

from mfem_ad_tpu.utils import profiling


def test_phase_accumulates_and_nests():
    profiling.reset()
    with profiling.phase("outer"):
        with profiling.phase("inner"):
            time.sleep(0.02)
        with profiling.phase("inner"):
            time.sleep(0.02)
        time.sleep(0.01)
    stats = profiling.cost_table()
    assert stats["inner"].count == 2
    assert stats["outer"].count == 1
    assert stats["inner"].total_s >= 0.04
    assert stats["outer"].total_s >= stats["inner"].total_s
    # exclusive time excludes the nested phases
    assert stats["outer"].self_s <= (
        stats["outer"].total_s - stats["inner"].total_s + 1e-6
    )
    table = profiling.format_cost_table()
    assert "outer" in table and "inner" in table and "per-call" in table
    profiling.reset()
    assert profiling.cost_table() == {}
    assert "no phases" in profiling.format_cost_table()


def test_phase_sync_blocks_on_device_work():
    import jax.numpy as jnp

    profiling.reset()
    x = jnp.ones((64, 64))
    with profiling.phase("matmul", sync=x @ x):
        pass
    assert profiling.cost_table()["matmul"].count == 1


def test_trace_none_is_noop_and_dir_traces():
    with profiling.trace(None):
        pass
    import tempfile

    import jax.numpy as jnp

    with tempfile.TemporaryDirectory() as d:
        with profiling.trace(d):
            _ = (jnp.ones((32, 32)) @ jnp.ones((32, 32))).block_until_ready()
        # jax.profiler.trace writes a plugins/profile/<run> directory
        prof = os.path.join(d, "plugins", "profile")
        assert os.path.isdir(prof) and os.listdir(prof)


def test_newton_records_phases():
    """The Newton driver annotates residual/direction/line-search phases."""
    from mfem_ad_tpu.models import poisson

    profiling.reset()
    _res, err, _pb = poisson.solve(ref_levels=2, order=1)
    assert err < 1e-2
    stats = profiling.cost_table()
    assert stats.get("newton/residual") is not None
    assert stats["newton/residual"].count >= 1
    assert stats.get("newton/direction") is not None
    total = sum(s.total_s for s in stats.values())
    assert np.isfinite(total) and total > 0.0
