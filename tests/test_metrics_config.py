import json
import os

import jax.numpy as jnp
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from dpu_olap_tpu import config
from dpu_olap_tpu.metrics import Counters, log, trace
from dpu_olap_tpu.ops.aggregate import aggregate
from dpu_olap_tpu.timer import Timers, timed


def test_counters_emit_roundtrip(capsys):
    c = Counters("bm_test").set("x", 1.5)
    c.items_processed(1000, 0.5)
    c.emit()
    out = json.loads(capsys.readouterr().out)
    assert out["name"] == "bm_test" and out["items_per_s"] == 2000.0


def test_counters_fold_timers():
    t = Timers()
    for rank in range(2):
        with timed(t, "phase", rank):
            pass
    c = Counters("bm").timers(t, ["phase"])
    assert "phase_ms" in c.values


def test_config_env_overrides(monkeypatch):
    monkeypatch.setenv("NR_DEVICES", "3")
    assert config.nr_devices() == 3
    monkeypatch.delenv("NR_DEVICES")
    monkeypatch.setenv("NR_DPUS", "5")  # reference spelling accepted
    assert config.nr_devices() == 5
    monkeypatch.setenv("SF", "7")
    assert config.scale_factor() == 7


def test_trace_annotation_runs():
    with trace("phase-x"):
        _ = jnp.sum(jnp.arange(8))


@pytest.mark.parametrize("agg", ["sum", "min", "max", "count"])
def test_aggregators_differential(rng, agg):
    v = rng.integers(0, 2**32, 1 << 14, dtype=np.uint32)
    got = aggregate(jnp.asarray(v), agg)
    arr = pa.array(v)
    expect = {
        "sum": int(pc.sum(arr).as_py()),
        "min": int(pc.min(arr).as_py()),
        "max": int(pc.max(arr).as_py()),
        "count": len(v),
    }[agg]
    assert got == expect


def test_unknown_aggregator_rejected():
    with pytest.raises(ValueError):
        aggregate(jnp.zeros(8, jnp.uint32), "median")


def test_time_chained_multi_interleaved():
    # the interleaved chained timer returns positive per-op times for every
    # candidate and keys them by name (bench.py's phase-attribution protocol)
    import jax.numpy as jnp

    from dpu_olap_tpu.bench.device_time import time_chained_multi

    x = jnp.arange(1 << 14, dtype=jnp.uint32)

    def f(c):
        return c ^ (jnp.cumsum(c) & jnp.uint32(3)).astype(jnp.uint32)

    def g(c):
        return c + jnp.uint32(1)

    out = time_chained_multi([("f", f, x, 4), ("g", g, x, 4)], reps=2)
    assert set(out) == {"f", "g"}
    assert all(v > 0 for v in out.values())


def test_bench_aggregate_samples():
    # the repetition-protocol aggregation: median/min/spread over numeric
    # keys present in every sample; bools and partial keys excluded
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench_mod", Path(__file__).resolve().parents[1] / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    samples = [
        {"a": 1.0, "b": 10, "flag": True, "only_first": 5},
        {"a": 3.0, "b": 20, "flag": False},
        {"a": 2.0, "b": 40, "flag": True},
    ]
    med, mn, spread = bench.aggregate_samples(samples)
    assert med == {"a": 2.0, "b": 20}
    assert mn == {"a": 1.0, "b": 10}
    assert abs(spread["a"] - 100.0) < 1e-9  # (3-1)/2
    assert abs(spread["b"] - 150.0) < 1e-9  # (40-10)/20
    assert "flag" not in med and "only_first" not in med
