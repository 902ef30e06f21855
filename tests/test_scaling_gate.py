"""Probe-gate semantics of the scaling campaign (scripts/scaling_bench.py):
the clean-sample definition is the round-4 north-rule measurement contract,
so pin it — a sample counts ONLY with a healthy pre-probe AND a healthy
in-run weather timeline, and legacy rows (no timeline / older format) never
count."""

import argparse
import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "scaling_bench",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "scaling_bench.py"),
)
sb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sb)

ARGS = argparse.Namespace(min_probe_gbs=60.0, min_inrun_gbs=8.0, min_inrun_frac=0.8)


def _row(**kw):
    base = {"fmt": sb.FMT, "probe_gbs": 90.0, "inrun_gbs": [20.0, 22.0, 21.0]}
    base.update(kw)
    return base


def test_clean_requires_probe_floor():
    assert sb.is_clean(_row(), ARGS)
    assert not sb.is_clean(_row(probe_gbs=59.9), ARGS)


def test_clean_requires_inrun_timeline():
    assert not sb.is_clean(_row(inrun_gbs=[]), ARGS)
    assert not sb.is_clean(_row(inrun_gbs=None), ARGS)
    # one frozen burst out of three -> 67% healthy < 80% floor
    assert not sb.is_clean(_row(inrun_gbs=[20.0, 0.0, 21.0]), ARGS)
    # one frozen out of five -> 80% healthy passes
    assert sb.is_clean(_row(inrun_gbs=[20.0, 0.0, 21.0, 22.0, 23.0]), ARGS)


def test_legacy_and_error_rows_never_clean():
    assert not sb.is_clean(_row(fmt=3), ARGS)  # pre-v4 engine samples
    r = _row()
    del r["fmt"]
    assert not sb.is_clean(r, ARGS)
    assert not sb.is_clean(_row(error="timeout"), ARGS)
