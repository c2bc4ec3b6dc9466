"""SQL entry point: registered-view surface (SURVEY §3, entry 3).

``register_views`` exposes the star schema as temp views so every
operator is reachable from ``spark.sql(...)`` as well as the
DataFrame API — both converge on the same Catalyst logical plan, so
correctness transfers between the surfaces.

``PORTABLE_SQL_KEYS`` lists the registry keys whose paired oracle
SQL is ANSI enough to run verbatim on BOTH engines (DuckDB and
Spark SQL); tests/test_sql_surface.py executes each through
``spark.sql`` and asserts it agrees with the DataFrame form —
proving the dual surface instead of claiming it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .tables import TABLE_NAMES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def _outside_literals_and_comments(sql: str) -> str:
    """The SQL text with single-quoted literals and ``--`` comments
    blanked out (quote/dash structure preserved), for token scoping."""
    out = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":  # string literal; '' escapes a quote
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append("'" + " " * max(0, j - i - 1) + "'")
            i = j + 1
        elif ch == "-" and i + 1 < n and sql[i + 1] == "-":
            j = sql.find("\n", i)
            j = n if j == -1 else j
            out.append(" " * (j - i))
            i = j
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def to_spark_sql(sql: str) -> str:
    """One-token dialect shim: DuckDB spells integer division ``//``,
    Spark SQL spells it ``div`` — identical semantics on the
    non-negative integer operands the money-grid oracles feed it
    (functions/money.py). Everything else in the portable subset
    parses verbatim on both engines.

    Scoped per ADVICE r6: the rewrite refuses any oracle where
    ``//`` appears inside a string literal or comment, so a blind
    replace can never corrupt a literal — today's oracles only emit
    the token via money.div_half_up_sql, and this guard keeps future
    oracles honest instead of silently mangling them.
    """
    token = " // "
    if sql.count(token) != _outside_literals_and_comments(sql).count(token):
        raise ValueError(
            "to_spark_sql: ' // ' occurs inside a string literal or "
            "comment; rewrite the oracle or extend the shim scoping"
        )
    return sql.replace(token, " div ")


#: Keys whose oracle SQL is portable Spark SQL (probed; each is
#: asserted equal to its DataFrame form in tests/test_sql_surface.py).
#: The rest use DuckDB-specific spellings (list_* functions,
#: generate_series, string_agg, quantile_cont, unnest-in-select) —
#: their Spark-side SQL would be a different string, which the
#: DataFrame form already is.
PORTABLE_SQL_KEYS: list[str] = [
    "agg_bool_and_or",
    "agg_weighted_percentile",
    "clean_winsorize",
    # sample_importance_reweight excluded since r8: its oracle pins
    # the ESS-moment fold order with DuckDB's ordered-aggregate
    # syntax (sum(x ORDER BY lang)), which Spark SQL does not parse —
    # the DataFrame form pins the same order via
    # array_sort(collect_list(...)) + aggregate.
    "agg_corr_covar",
    "agg_cube",
    "agg_distinct_count",
    "agg_global",
    "agg_grouping_sets",
    "agg_having",
    "agg_histogram_bins",
    "agg_max_by",
    "agg_pricing_summary",
    "agg_rollup",
    "clean_impute_nulls",
    "clean_outlier_zscore",
    "custdist_two_level_agg",
    "dedup_latest_by_key",
    "distinct_exact",
    "filter_compound",
    "filter_null_semantics",
    "join_anti",
    "join_broadcast",
    "join_full_outer",
    "join_inner_equi",
    "join_left_outer",
    "join_multiway_star",
    "join_range_interval",
    "join_right_outer",
    "join_semi",
    "join_skew_events_customers",
    "join_theta",
    "limit_topk",
    "map_from_entries",
    "merge_upsert_batch",
    # multimodal_join excluded: its oracle indexes embedding[1],
    # which is 1-based in DuckDB but 0-based in Spark SQL — the
    # string parses on both engines yet means different elements.
    "pivot_event_types",
    "project_compute",
    "scalar_conditional",
    "scalar_math",
    "sample_hash_mod",
    "sample_stratified",
    "scalar_bitwise",
    "scan_parquet",
    "scan_with_pushdown",
    "sessionize_gap_batch",
    "set_except",
    "set_intersect",
    "set_union_all",
    "set_union_distinct",
    "sort_multikey",
    "stream_session",
    "stream_stateful_counter",
    "subquery_correlated",
    "stream_tumbling",
    "tpch_q14_promo_share",
    "tpch_q3_topk",
    "udaf_geomean",
    "window_ntile_percent",
    "window_share_of_total",
    "window_range_frame",
    "window_rank_topn",
    "window_running_total",
]

#: Sanctioned holes in the dual-SQL surface (VERDICT r8 item 7): keys
#: whose oracle would otherwise belong to the portable subset but is
#: excluded for a DOCUMENTED engine-syntax/semantics gap. Every entry
#: needs a reason string; tests/test_sql_surface.py pins the exact
#: contents so the portable surface can only shrink via an explicit,
#: reviewed edit here — never silently.
PORTABLE_SQL_EXCLUSIONS: dict[str, str] = {
    "sample_importance_reweight": (
        "oracle pins the ESS-moment fold order with DuckDB's "
        "ordered-aggregate syntax (sum(x ORDER BY lang)), which Spark "
        "SQL does not parse; the DataFrame form pins the same order "
        "via array_sort(collect_list(...)) + aggregate"
    ),
    "multimodal_join": (
        "oracle indexes embedding[1], 1-based in DuckDB but 0-based "
        "in Spark SQL — parses on both engines yet selects different "
        "elements"
    ),
}
