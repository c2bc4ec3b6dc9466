"""Regression pins for the driver-sim comparator (tools/comparator.py).

VERDICT.md r5 item 4: the old ``%.6g`` float rendering was provably
weaker than the real driver — the r5 ``tpch_q10_returned_items`` red
was a single-cent flip (307843.60 vs 307843.59) that renders
identically at 6 significant digits, so the local sf0.1 receipt was
green while the driver failed. These tests feed the comparator that
exact pair (and the surrounding sensitivity/tolerance contract) so the
strictness can never silently regress: a receipt from driver_sim is
only evidence if its comparator is at least as strict as the driver's.

No SparkSession needed — the comparator is pure.
"""
import datetime
import decimal
import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "driver_sim_comparator",
    os.path.join(os.path.dirname(__file__), "..", "tools", "comparator.py"),
)
comparator = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(comparator)
norm, value_hash = comparator.norm, comparator.value_hash


def test_q10_cent_flip_is_caught():
    """The exact r5 driver red: one cent on a ~3x10^5 revenue value."""
    good = [(249, "Customer#249", 307843.60)]
    bad = [(249, "Customer#249", 307843.59)]
    cols = ["c_custkey", "c_name", "revenue"]
    assert value_hash(good, cols) != value_hash(bad, cols)


def test_cent_sensitivity_survives_large_magnitudes():
    # 9 significant digits of dollars still differ by a cent
    assert norm(123456789.01) != norm(123456789.02)


def test_ulp_jitter_beyond_declared_rounding_is_tolerated():
    # identical money values that differ past the round(v, 9) grid
    a = 307843.60
    b = a + 1e-10
    assert norm(a) == norm(b)


def test_negative_zero_collapses():
    assert norm(-0.0) == norm(0.0)


def test_type_tags_keep_hugeint_and_bigint_apart():
    assert norm(decimal.Decimal(6)) != norm(6)
    assert norm(True) != norm(1)
    assert norm(float("nan")) != norm(None)


def test_hash_is_column_order_insensitive_but_value_sensitive():
    rows_ab = [(1, 2.5)]
    cols_ab = ["a", "b"]
    rows_ba = [(2.5, 1)]
    cols_ba = ["b", "a"]
    assert value_hash(rows_ab, cols_ab) == value_hash(rows_ba, cols_ba)
    assert value_hash([(1, 2.5)], cols_ab) != value_hash([(1, 2.6)], cols_ab)


def test_temporal_and_bytes_render_stably():
    ts = datetime.datetime(1996, 1, 1, 12, 0, 0)
    assert norm(ts) == "t:1996-01-01T12:00:00"
    assert norm(datetime.date(1996, 1, 1)) == "D:1996-01-01"
    assert norm(b"\x00\xff") == "x:00ff"
