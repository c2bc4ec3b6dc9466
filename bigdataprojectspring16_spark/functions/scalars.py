"""Category H — scalar function library (SURVEY §2.H).

String / date / math / conditional / array / map / JSON / pivot — all
JVM-side built-ins inside whole-stage codegen; no Python crosses the
hot path. Known cross-engine hazards handled here (SURVEY §5.3):

- ``datediff`` argument order: Spark ``datediff(end, start)`` ==
  DuckDB ``date_diff('day', start, end)``.
- day-of-week numbering: Spark ``dayofweek`` is 1=Sunday..7, DuckDB
  ``date_part('dow')`` is 0=Sunday..6 → Spark side subtracts 1.
- ``date_add`` returns DATE in Spark → cast back to timestamp.
- integer-result functions (``ceil``, ``year``, rank-like) are cast
  so both engines emit BIGINT/DOUBLE identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import money
from .money import sum_exact as _sum_exact_int
from ..registry import query
from ..tables import load_table


@query(
    "scalar_string",
    oracle="""
    SELECT
        p_brand,
        count(*) AS n_parts,
        lpad(regexp_extract(p_brand, '([0-9]+)', 1), 4, '0') AS brand_num,
        min(upper(p_name)) AS min_name_upper,
        max(lower(p_type)) AS max_type_lower,
        min(substr(p_name, 1, 5)) AS min_name_prefix,
        min(concat_ws('|', p_brand, replace(p_name, ' ', '_'))) AS min_tagged,
        min(trim(' ' || p_name || ' ')) AS min_trimmed,
        CAST(min(length(p_name)) AS BIGINT) AS min_name_len,
        min(string_split(p_name, ' ')[1]) AS min_first_word
    FROM part
    GROUP BY p_brand
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substr/length/concat_ws/trim/lpad/regexp_extract/
    replace/split over part names & brands, grouped per brand."""
    p = load_table(spark, sf_dir, "part")
    agged = p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min(F.upper("p_name")).alias("min_name_upper"),
        F.max(F.lower("p_type")).alias("max_type_lower"),
        F.min(F.substring("p_name", 1, 5)).alias("min_name_prefix"),
        F.min(
            F.concat_ws("|", F.col("p_brand"), F.replace(F.col("p_name"), F.lit(" "), F.lit("_")))
        ).alias("min_tagged"),
        F.min(F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" ")))).alias(
            "min_trimmed"
        ),
        F.min(F.length("p_name")).cast("long").alias("min_name_len"),
        F.min(F.split(F.col("p_name"), " ").getItem(0)).alias("min_first_word"),
    )
    return agged.withColumn(
        "brand_num",
        F.lpad(F.regexp_extract(F.col("p_brand"), r"([0-9]+)", 1), 4, "0"),
    )


@query(
    "scalar_date",
    oracle="""
    SELECT
        CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        CAST(year(o_orderdate) AS BIGINT) AS yr,
        CAST(month(o_orderdate) AS BIGINT) AS mon,
        count(*) AS n_lines,
        round(avg(date_diff('day', o_orderdate, l_shipdate)), 4)
            AS avg_ship_latency_days,
        min(l_shipdate) AS min_ship_date,
        max(l_shipdate + INTERVAL 30 DAY) AS max_ship_plus30,
        last_day(min(o_orderdate)) AS last_day_of_min_order,
        count(CASE WHEN date_part('dow', o_orderdate) IN (0, 6) THEN 1 END)
            AS n_weekend_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1, 2, 3
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/date_trunc/datediff/date_add/last_day/dow over dates."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = o.join(li, o.o_orderkey == li.l_orderkey)
    dow = F.dayofweek("o_orderdate") - 1  # Spark 1=Sun..7 → DuckDB 0=Sun..6
    return (
        j.groupBy(
            F.trunc(F.col("o_orderdate"), "month").alias("month_start"),
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mon"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.avg(F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))), 4
            ).alias("avg_ship_latency_days"),
            F.min("l_shipdate").alias("min_ship_date"),
            F.max(F.date_add(F.col("l_shipdate"), 30).cast("timestamp")).alias(
                "max_ship_plus30"
            ),
            F.last_day(F.min("o_orderdate")).alias("last_day_of_min_order"),
            F.count(F.when(dow.isin(0, 6), 1)).alias("n_weekend_lines"),
        )
    )


@query(
    "scalar_math",
    oracle="""
    SELECT
        l_returnflag,
        -- floor-quantize-then-sum: floor(x*1e6) of identical doubles is
        -- engine-exact (no round-half semantics), so the sum is exact
        -- integer arithmetic in any order; a raw float sum of sqrt()
        -- drifts ~1e-5 at sf0.1 against a 5e-5 rounding boundary
        round(CAST(sum(CAST(floor(sqrt(l_extendedprice) * 1000000) AS BIGINT))
                   AS DOUBLE) / 1000000.0, 4) AS sum_sqrt_price,
        round(avg(ln(l_extendedprice)), 6) AS avg_ln_price,
        round(avg(log10(l_extendedprice)), 6) AS avg_log10_price,
        round(CAST(sum(CAST(ceil(l_quantity) AS BIGINT)) AS DOUBLE), 1)
            AS sum_ceil_qty,
        round(CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS DOUBLE), 1)
            AS sum_floor_qty,
        -- exact 1e-2 units: l_discount sits on the 0.01 grid, so
        -- |pct - 5| is an exact small integer per row (§MONEY r8)
        round(CAST(sum(abs(CAST(round(l_discount * 100) AS BIGINT) - 5))
                   AS DOUBLE) / 100.0, 6) AS sum_abs_disc_dev,
        round(avg(CAST(sign(l_discount - 0.05) AS DOUBLE)), 6) AS avg_sign_disc,
        round(sum(pow(l_discount, 2)), 6) AS sum_disc_sq,
        count(CASE WHEN l_orderkey % 7 = 0 THEN 1 END) AS n_mod7,
        round(CAST(sum(CAST(round(l_extendedprice, 0) AS BIGINT)) AS DOUBLE),
              1) AS sum_rounded_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/sqrt/pow/ln/log10/sign/pmod over prices.

    §MONEY r8: the integral sums (ceil/floor quantity, rounded price)
    and the 2-dp-grid deviation sum run as exact integer aggregates —
    a float sum of integers only holds to 2^53, and the per-flag
    groups are fact-table-scale. sum_disc_sq / the ln-log averages
    stay in the documented sub-1e-7 residual class (SCALING §MONEY).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            _sum_exact_int(
                F.floor(F.sqrt("l_extendedprice") * 1000000)
            ).cast("double")
            / 1000000.0,
            4,
        ).alias("sum_sqrt_price"),
        F.round(F.avg(F.log("l_extendedprice")), 6).alias("avg_ln_price"),
        F.round(F.avg(F.log10("l_extendedprice")), 6).alias("avg_log10_price"),
        F.round(
            _sum_exact_int(F.ceil("l_quantity")).cast("double"), 1
        ).alias("sum_ceil_qty"),
        F.round(
            _sum_exact_int(F.floor("l_quantity")).cast("double"), 1
        ).alias("sum_floor_qty"),
        # exact 1e-2 units (§MONEY r8): the per-flag deviation sum is
        # fact-table-scale; |pct - 5| is an exact integer per row
        F.round(
            _sum_exact_int(
                F.abs(money.pct(F.col("l_discount")) - F.lit(5))
            ).cast("double")
            / 100.0,
            6,
        ).alias("sum_abs_disc_dev"),
        F.round(
            F.avg(F.signum(F.col("l_discount") - 0.05).cast("double")), 6
        ).alias("avg_sign_disc"),
        F.round(F.sum(F.pow("l_discount", F.lit(2))), 6).alias("sum_disc_sq"),
        F.count(F.when(F.pmod(F.col("l_orderkey"), F.lit(7)) == 0, 1)).alias(
            "n_mod7"
        ),
        F.round(
            _sum_exact_int(
                F.round(F.col("l_extendedprice"), 0).cast("long")
            ).cast("double"),
            1,
        ).alias("sum_rounded_price"),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT
        CASE WHEN o_totalprice < 100000 THEN 'low'
             WHEN o_totalprice < 250000 THEN 'mid'
             ELSE 'high' END AS price_tier,
        count(*) AS n_orders,
        CAST(sum(greatest(CAST(round(o_totalprice * 100) AS BIGINT),
                          15000000)) AS DOUBLE) / 100.0 AS sum_floor150k,
        CAST(sum(least(CAST(round(o_totalprice * 100) AS BIGINT),
                       15000000)) AS DOUBLE) / 100.0 AS sum_cap150k,
        count(nullif(o_orderstatus, 'F')) AS n_not_finished,
        CAST(sum(coalesce(nullif(CAST(round(o_totalprice * 100) AS BIGINT),
                                 0), 0)) AS DOUBLE) / 100.0 AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN tiering + coalesce/nullif/greatest/least.

    The money sums run on the exact cent grid (greatest/least/nullif
    against integer cents): the 'high' tier sums a table-scale group
    to ~3e11, where the float sum's accumulated error crosses the
    half-cent — the §SF1 decade caught exactly this flip."""
    o = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 250000, "mid")
        .otherwise("high")
    )
    price_c = money.cents(F.col("o_totalprice"))
    return o.groupBy(tier.alias("price_tier")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        (
            money.sum_exact(
                F.greatest(price_c, F.lit(15000000).cast("long"))
            ).cast("double")
            / 100.0
        ).alias("sum_floor150k"),
        (
            money.sum_exact(
                F.least(price_c, F.lit(15000000).cast("long"))
            ).cast("double")
            / 100.0
        ).alias("sum_cap150k"),
        F.count(F.nullif(F.col("o_orderstatus"), F.lit("F"))).alias(
            "n_not_finished"
        ),
        (
            money.sum_exact(
                F.coalesce(
                    F.nullif(price_c, F.lit(0).cast("long")),
                    F.lit(0).cast("long"),
                )
            ).cast("double")
            / 100.0
        ).alias("sum_price"),
    )


@query(
    "array_ops",
    oracle="""
    WITH toks AS (
        SELECT
            lang,
            string_split(text, ' ') AS tokens,
            list_sort(list_distinct(string_split(text, ' '))) AS utoks
        FROM documents
    )
    SELECT
        lang,
        count(*) AS n_docs,
        round(avg(len(tokens)), 4) AS avg_n_tokens,
        round(avg(len(utoks)), 4) AS avg_n_unique,
        count(CASE WHEN list_contains(tokens, 'data') THEN 1 END)
            AS n_with_data,
        min(array_to_string(utoks[1:3], ' ')) AS min_first3_unique
    FROM toks
    GROUP BY lang
    """,
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split/size/array_contains/array_distinct/sort_array/slice per doc."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.split(F.col("text"), " ").alias("tokens"),
        F.sort_array(F.array_distinct(F.split(F.col("text"), " "))).alias("utoks"),
    )
    return toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.size("tokens")), 4).alias("avg_n_tokens"),
        F.round(F.avg(F.size("utoks")), 4).alias("avg_n_unique"),
        F.count(F.when(F.array_contains(F.col("tokens"), "data"), 1)).alias(
            "n_with_data"
        ),
        F.min(F.concat_ws(" ", F.slice(F.col("utoks"), 1, 3))).alias(
            "min_first3_unique"
        ),
    )


@query(
    "explode_wordcount",
    oracle="""
    SELECT word, n, rank FROM (
        SELECT
            word,
            count(*) AS n,
            row_number() OVER (ORDER BY count(*) DESC, word) AS rank
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word
    ) WHERE rank <= 20
    """,
)
def explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode tokens → global word count → deterministic top-20.

    TakeOrdered(20) does the distributed top-k (per-partition heaps,
    no global sort); the rank column is then a two-phase global rank
    over the 20 surviving rows — no unpartitioned window anywhere
    in the plan.
    """
    from ..plans.ranks import with_global_rank

    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top20 = counts.orderBy(F.desc("n"), F.asc("word")).limit(20)
    return with_global_rank(
        top20, [F.desc("n"), F.asc("word")], rank_col="rank"
    ).select("word", "n", "rank")


@query(
    "map_from_entries",
    oracle="""
    WITH per AS (
        SELECT user_id, event_type, count(*) AS type_count
        FROM events
        GROUP BY user_id, event_type
    )
    SELECT
        user_id,
        event_type,
        type_count,
        count(*) OVER (PARTITION BY user_id) AS n_types,
        coalesce(
            max(CASE WHEN event_type = 'click' THEN type_count END)
                OVER (PARTITION BY user_id),
            0
        ) AS n_clicks
    FROM per
    """,
)
def map_from_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build MapType per user, probe it, explode back to checkable rows.

    The map is real (map_from_entries → element_at / map_keys); the
    declared output explodes it back to (key, value) rows because
    hashing map columns across engines is brittle (SURVEY §2.H).
    """
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("type_count")
    )
    maps = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "type_count"))
        ).alias("type_map")
    )
    return maps.select(
        "user_id",
        F.explode(F.col("type_map")).alias("event_type", "type_count"),
        F.size(F.map_keys(F.col("type_map"))).cast("long").alias("n_types"),
        F.coalesce(
            F.element_at(F.col("type_map"), "click"), F.lit(0).cast("long")
        ).alias("n_clicks"),
    )


@query(
    "json_extract",
    oracle="""
    SELECT
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        count(*) AS n_events,
        CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
            / 100.0 AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON extraction from events.props ({"k": int} payloads).

    Uses schema-typed ``from_json`` (the scalable path — one parse,
    typed column); ``get_json_object`` parity is covered in unit
    tests. The per-k value sum grows with event rate, so it runs on
    exact integer cents (§MONEY r8; events.value is 2-dp grid).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.from_json(F.col("props"), "k BIGINT").getField("k").alias("k"),
            "value",
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                _sum_exact_int(money.cents(F.col("value")))
                .cast("double") / 100.0
            ).alias("sum_value"),
        )
    )


@query(
    "pivot_event_types",
    oracle="""
    SELECT
        user_id,
        count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        count(CASE WHEN event_type = 'view' THEN 1 END) AS view
    FROM events
    GROUP BY user_id
    """,
)
def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user count matrix over the 5 measured event types.

    Pivot values are pinned explicitly — at 100 TB an unpinned pivot
    first runs a distinct over the pivot column; pinning skips that
    pass entirely. Nulls from absent combinations are coalesced to 0
    to match SQL conditional-count semantics.
    """
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    wide = ev.groupBy("user_id").pivot("event_type", types).count()
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0).cast("long")).alias(t) for t in types],
    )


@query(
    "array_hof",
    oracle="""
    WITH t AS (
        SELECT lang, string_split(text, ' ') AS toks FROM documents
    ),
    per_doc AS (
        SELECT
            lang,
            len(list_filter(toks, t -> length(t) > 6)) AS n_long,
            len(list_filter(toks, t -> t = 'vector')) > 0 AS has_marker,
            len(list_filter(toks, t -> NOT length(t) > 0)) = 0 AS all_nonempty,
            list_aggregate(list_transform(toks, t -> length(t)), 'sum')
                AS total_tok_chars
        FROM t
    )
    SELECT
        lang,
        CAST(sum(n_long) AS BIGINT) AS long_tokens,
        count(*) FILTER (has_marker) AS docs_with_marker,
        CAST(min(CAST(all_nonempty AS INT)) AS BOOLEAN) AS every_doc_clean,
        CAST(sum(total_tok_chars) AS BIGINT) AS total_chars
    FROM per_doc GROUP BY lang
    """,
)
def array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: filter / exists / forall /
    transform / aggregate (reduce) — all JVM-side lambda expressions,
    no Python. Per-doc narrow maps followed by one keyed aggregation.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    per_doc = d.select(
        "lang",
        F.size(F.filter(toks, lambda t: F.length(t) > 6)).alias("n_long"),
        F.exists(toks, lambda t: t == "vector").alias("has_marker"),
        F.forall(toks, lambda t: F.length(t) > 0).alias("all_nonempty"),
        F.aggregate(
            F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
        ).alias("total_tok_chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.sum("n_long").alias("long_tokens"),
        F.count_if(F.col("has_marker")).alias("docs_with_marker"),
        F.min(F.col("all_nonempty").cast("int")).cast("boolean").alias(
            "every_doc_clean"
        ),
        F.sum("total_tok_chars").alias("total_chars"),
    )


@query(
    "unpivot_metrics",
    oracle="""
    WITH wide AS (
        SELECT
            c_mktsegment,
            CAST(count(*) AS DOUBLE) AS n_orders,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                / 100.0 AS sum_price,
            round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS DOUBLE) / 100.0 / count(*), 2) AS avg_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, metric, value
    FROM wide UNPIVOT (value FOR metric IN (n_orders, sum_price, avg_price))
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt: wide per-segment metric columns to long
    (segment, metric, value) rows — the inverse of
    ``pivot_event_types``. ``DataFrame.unpivot`` is a narrow
    expression-level expansion (each row emits 3), so it adds no
    shuffle beyond the aggregation that built the wide frame.
    Segment-level money sums are fact-table-scale: exact integer
    cents, with the average derived from the same exact total
    (§MONEY r8).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    price_c = _sum_exact_int(money.cents(F.col("o_totalprice")))
    wide = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_orders"),
            (price_c.cast("double") / 100.0).alias("sum_price"),
            F.round(
                price_c.cast("double") / 100.0 / F.count(F.lit(1)), 2
            ).alias("avg_price"),
        )
    )
    return wide.unpivot(
        ["c_mktsegment"], ["n_orders", "sum_price", "avg_price"],
        "metric", "value",
    )


@query(
    "scalar_bitwise",
    oracle="""
    SELECT o_orderstatus,
           CAST(sum(o_orderkey & 15) AS BIGINT) AS sum_low_nibble,
           CAST(sum((o_orderkey >> 4) & 15) AS BIGINT) AS sum_next_nibble,
           bit_xor(o_orderkey) AS xor_keys,
           bit_or(o_orderkey & 255) AS or_low_byte,
           bit_and(o_orderkey | 4095) AS and_key_mask
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar ops (&, |, >>) and bitwise aggregates
    (bit_and/bit_or/bit_xor) over order keys per status.

    Cross-engine hazard worth pinning: ``^`` is bitwise XOR in Spark
    SQL but POWER in DuckDB — the oracle uses the aggregate
    ``bit_xor`` and avoids infix xor entirely. All ops are pure
    integer arithmetic inside whole-stage codegen; the aggregates are
    algebraic (partial-combinable), so the shuffle carries one row
    per group like any sum.
    """
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.groupBy("o_orderstatus").agg(
        F.sum(k.bitwiseAND(F.lit(15))).alias("sum_low_nibble"),
        F.sum(F.shiftright(k, 4).bitwiseAND(F.lit(15))).alias("sum_next_nibble"),
        F.bit_xor(k).alias("xor_keys"),
        F.bit_or(k.bitwiseAND(F.lit(255))).alias("or_low_byte"),
        F.bit_and(k.bitwiseOR(F.lit(4095))).alias("and_key_mask"),
    )


@query(
    "scalar_try_cast",
    oracle="""
    SELECT event_type,
           count(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER))
               AS n_numeric,
           count(TRY_CAST(event_type AS INTEGER)) AS n_bogus,
           CAST(sum(coalesce(TRY_CAST(json_extract_string(props, '$.k')
                                      AS INTEGER), 0)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
)
def scalar_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe type coercion: ``try_cast`` yields NULL instead of
    failing on malformed input — the ingestion-hardening primitive
    for schema-on-read. Numeric JSON payload values cast cleanly
    (n_numeric = row count); casting the non-numeric event_type
    yields all NULLs (n_bogus = 0) without poisoning the job.

    A plain CAST of a bad string throws (ANSI mode) or silently
    nulls depending on config — try_cast pins the semantics
    explicitly, identically in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").try_cast("int")
    return ev.groupBy("event_type").agg(
        F.count(k).alias("n_numeric"),
        F.count(F.col("event_type").try_cast("int")).alias("n_bogus"),
        F.sum(F.coalesce(k, F.lit(0))).alias("sum_k"),
    )


@query(
    "map_hof",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
    )
    SELECT event_type,
           count(*) AS n_users,
           round(sum(round(ln(n), 6)), 6) AS sum_log
    FROM c WHERE n >= 3
    GROUP BY event_type
    """,
)
def map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions, end-to-end verified: build each
    user's event_type→count map (`map_from_entries` over collected
    structs), gate it with `map_filter(v >= 3)`, rescale with
    `transform_values(ln)`, then explode back to rows and aggregate.

    The oracle computes the same result relationally (counts →
    filter → ln) — a semantic check that the map-typed path filters
    and transforms exactly like its flat twin; maps never appear in
    the output (map column ordering is engine-arbitrary, so they are
    not hashable across engines). All lambdas are JVM-side Catalyst
    expressions — no Python in the loop.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    maps = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("m")
    )
    transformed = maps.select(
        "user_id",
        F.transform_values(
            F.map_filter("m", lambda k, v: v >= 3),
            lambda k, v: F.round(F.log(v.cast("double")), 6),
        ).alias("m"),
    )
    exploded = transformed.select(
        "user_id", F.explode("m").alias("event_type", "logn")
    )
    return exploded.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.sum("logn"), 6).alias("sum_log"),
    )
