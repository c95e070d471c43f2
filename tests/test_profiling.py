"""Profiling utilities (utils/profiling.py): stage timers and the
jax.profiler trace context (SURVEY.md §5 build item — the reference has
no profiler integration)."""

import os

import jax.numpy as jnp

from lbic_tpu.utils.profiling import StageTimers, annotate, trace


def test_stage_timers_accumulate():
    t = StageTimers()
    with t("a") as h:
        h.out = jnp.arange(8) * 2
    with t("a") as h:
        h.out = jnp.sum(jnp.arange(8))
    with t("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert t.totals["a"] > 0
    rep = t.report()
    assert "a" in rep and "b" in rep


def test_trace_writes_xplane(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d):
        with annotate("stage"):
            jnp.ones((4, 4)).sum().block_until_ready()
    found = []
    for root, _, files in os.walk(d):
        found += [f for f in files if f.endswith((".xplane.pb", ".json.gz",
                                                  ".trace.json.gz"))]
    assert found, f"no trace artifacts under {d}"
