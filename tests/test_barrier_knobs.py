"""Both settings of the materialization-barrier knobs must be
result-identical (SCALING.md §CC / §K).

The shipped defaults are performance choices measured at fixture
scale (dedup re-evaluates shared frames; PageRank checkpoints its
loop invariants); the OTHER setting of each knob is the documented
100 TB deployment path. Without these tests the non-default path has
no regression guard — the parity suite only ever runs the defaults.
"""

from __future__ import annotations

import pytest

from bigdataprojectspring16_spark import QUERIES
from bigdataprojectspring16_spark.llmops import dedup, graph

from .conftest import SF_SMALL as SF_DIR


def _rows(spark, key):
    return sorted(tuple(r) for r in QUERIES[key](spark, SF_DIR).collect())


@pytest.mark.parametrize(
    "key",
    ["dedup_minhash_lsh", "dedup_threshold_sweep", "dedup_near_jaccard"],
)
def test_materialize_shared_both_settings_identical(spark, key):
    saved = dedup.MATERIALIZE_SHARED
    try:
        dedup.MATERIALIZE_SHARED = False
        base = _rows(spark, key)
        dedup.MATERIALIZE_SHARED = True
        alt = _rows(spark, key)
    finally:
        dedup.MATERIALIZE_SHARED = saved
    assert base == alt


def test_materialize_invariants_both_settings_identical(spark):
    saved = graph.MATERIALIZE_INVARIANTS
    try:
        graph.MATERIALIZE_INVARIANTS = True
        base = _rows(spark, "graph_pagerank_rounds")
        graph.MATERIALIZE_INVARIANTS = False
        alt = _rows(spark, "graph_pagerank_rounds")
    finally:
        graph.MATERIALIZE_INVARIANTS = saved
    assert base == alt


def test_lazy_checkpoint_both_settings_identical(spark):
    saved = graph.LAZY_CHECKPOINT
    try:
        graph.LAZY_CHECKPOINT = True
        base = _rows(spark, "graph_connected_components")
        graph.LAZY_CHECKPOINT = False
        alt = _rows(spark, "graph_connected_components")
    finally:
        graph.LAZY_CHECKPOINT = saved
    assert base == alt
