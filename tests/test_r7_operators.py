"""Behavioral invariants for the r7 operators — properties the
oracle hash can't state directly (threshold optimality, pair
symmetry, conservation of weighted mass, spectral norms, partition
invariance).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdataprojectspring16_spark import QUERIES
from bigdataprojectspring16_spark.tables import load_table

from .conftest import SF_SMALL as SF_DIR


def test_weighted_percentile_matches_bruteforce(spark):
    out = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_weighted_percentile"](spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    rows = li.select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    by_flag: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (round(r["l_extendedprice"] * 100), round(r["l_quantity"]))
        )
    for flag, pairs in by_flag.items():
        pairs.sort()
        total = sum(w for _, w in pairs)
        assert out[flag]["total_weight"] == total
        for col, k, m in (("w_p25", 4, 1), ("w_p50", 2, 1), ("w_p75", 4, 3)):
            cum = 0
            expect = None
            for price_c, w in pairs:
                cum += w
                if k * cum >= m * total:
                    expect = price_c / 100.0
                    break
            assert out[flag][col] == expect, (flag, col)
        # percentiles are monotone by construction
        assert out[flag]["w_p25"] <= out[flag]["w_p50"] <= out[flag]["w_p75"]


def test_interval_self_overlap_matches_bruteforce_pairs(spark):
    out = {
        r["c_mktsegment"]: r
        for r in QUERIES["join_interval_self_overlap"](spark, SF_DIR).collect()
    }
    o = load_table(spark, SF_DIR, "orders").collect()
    c = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in load_table(spark, SF_DIR, "customer").collect()
    }
    by_cust: dict[int, list] = {}
    for r in o:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    per_seg: dict[str, list[int]] = {}
    for cust, orders in by_cust.items():
        for i, a in enumerate(orders):
            for b in orders[i + 1 :]:
                sa, sb = a["o_orderdate"], b["o_orderdate"]
                days = 30 - abs((sb - sa).days)
                # windows are [s, s+30d): overlap iff starts differ by <30d
                if days > 0:
                    per_seg.setdefault(c[cust], []).append(days)
    assert set(out) == set(per_seg)
    for seg, overlaps in per_seg.items():
        assert out[seg]["n_overlap_pairs"] == len(overlaps)
        assert out[seg]["sum_overlap_days"] == sum(overlaps)
    # each unordered pair is counted exactly once (a < b tiebreak):
    # total pairs can never exceed sum over customers of C(n_i, 2)
    cap = sum(len(v) * (len(v) - 1) // 2 for v in by_cust.values())
    assert sum(r["n_overlap_pairs"] for r in out.values()) <= cap


def test_importance_reweight_conserves_weighted_mass(spark):
    out = QUERIES["sample_importance_reweight"](spark, SF_DIR).collect()
    n_total = sum(r["n_docs"] for r in out)
    # targets sum to 1, so the reweighted corpus mass equals the
    # corpus size: sum n_l * w_l == n (up to the 6-dp weight rounding)
    mass = sum(r["n_docs"] * r["weight"] for r in out)
    assert abs(mass - n_total) < 1e-2 * n_total
    for r in out:
        # weight reproduces target/actual from the exact counts
        assert abs(
            r["weight"] - r["target_share"] * n_total / r["n_docs"]
        ) < 1e-6
        # ESS share is a ratio in (0, 1]
        assert 0.0 < r["ess_share"] <= 1.0 + 1e-9
    assert abs(sum(r["target_share"] for r in out) - 1.0) < 1e-9


def test_pca_power_loading_is_unit_norm_and_partition_invariant(spark):
    out = QUERIES["embeddings_pca_power"](spark, SF_DIR).collect()
    loadings = [r["loading"] for r in out]
    assert len(loadings) == 64
    # normalized at the last round boundary (6-dp quantization slack)
    assert abs(math.sqrt(sum(x * x for x in loadings)) - 1.0) < 1e-4
    # quantized-round discipline: the result must not depend on the
    # input partitioning (the whole point of quantizing boundaries)
    e = load_table(spark, SF_DIR, "embeddings").repartition(13)
    base = {r["dim"]: r["loading"] for r in out}
    # rebuild the query inline over the repartitioned frame
    m = e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "val"
        ),
    ).select("vec_id", (F.col("pos") + 1).alias("dim"), "val")
    v = m.select("dim").distinct().select("dim", F.lit(0.125).alias("v"))
    for _ in range(3):
        s = (
            m.join(F.broadcast(v), "dim")
            .groupBy("vec_id")
            .agg(F.round(F.sum(F.col("val") * F.col("v")), 6).alias("s"))
        )
        w = (
            m.join(s, "vec_id")
            .groupBy("dim")
            .agg(F.sum(F.col("val") * F.col("s")).alias("w"))
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        v = w.crossJoin(F.broadcast(nrm)).select(
            "dim", F.round(F.col("w") / F.col("nrm"), 6).alias("v")
        )
    alt = {r["dim"]: r["v"] for r in v.collect()}
    assert alt == base


def test_pca_power_recovers_planted_dominant_direction(spark):
    # synthetic: dim 3 carries 10x the variance of the others — the
    # loading must concentrate there with the sign of the start
    # vector's overlap (positive, since v0 is all-positive).
    rows = []
    for i in range(200):
        base = [0.01 * ((i * 7 + d) % 5 - 2) for d in range(8)]
        base[3] += 1.0 if i % 2 == 0 else -1.0
        rows.append((i, base))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m = df.select(
        "vec_id",
        F.posexplode("embedding").alias("pos", "val"),
    ).select("vec_id", (F.col("pos") + 1).alias("dim"), "val")
    v = m.select("dim").distinct().select("dim", F.lit(0.125).alias("v"))
    for _ in range(3):
        s = (
            m.join(F.broadcast(v), "dim")
            .groupBy("vec_id")
            .agg(F.round(F.sum(F.col("val") * F.col("v")), 6).alias("s"))
        )
        w = (
            m.join(s, "vec_id")
            .groupBy("dim")
            .agg(F.sum(F.col("val") * F.col("s")).alias("w"))
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        v = w.crossJoin(F.broadcast(nrm)).select(
            "dim", F.round(F.col("w") / F.col("nrm"), 6).alias("v")
        )
    got = {r["dim"]: r["v"] for r in v.collect()}
    assert abs(got[4]) > 0.95  # dim index is 1-based; planted dim 3 -> key 4
    assert all(abs(got[d]) < 0.3 for d in got if d != 4)
