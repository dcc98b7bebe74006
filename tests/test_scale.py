"""Scale-helper tests: bucketed joins eliminate the shuffle; salted
aggregation/join match their plain equivalents exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_spark.operators.scale import salted_agg, salted_join, write_bucketed
from vectordb_spark.plans.audit import plan_of

SF = "/root/testdata/sf0.001"


def test_bucketed_join_no_exchange(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    write_bucketed(li, str(tmp_path / "li"), "b_lineitem", "l_orderkey", 8)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        str(tmp_path / "o"),
        "b_orders",
        "l_orderkey",
        8,
    )
    bl = spark.table("b_lineitem")
    bo = spark.table("b_orders")
    joined = bl.hint("MERGE").join(bo, "l_orderkey")
    plan = plan_of(joined)
    # co-located bucketed sides: the sort-merge join needs no Exchange
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    # and it returns the right rows
    expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert joined.count() == expected
    spark.sql("DROP TABLE b_lineitem")
    spark.sql("DROP TABLE b_orders")


def test_salted_agg_matches_plain(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    plain = {
        (r.event_type): (r.n, r.mx)
        for r in e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        (r.event_type): (r.n, r.mx)
        for r in salted_agg(
            e, "event_type", "event_id", {"n": "count", "mx": "max:value"}
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = o.join(c, "o_custkey").count()
    salted = salted_join(o, c, "o_custkey", "o_orderkey", n_salts=8).count()
    assert salted == plain


def test_embedding_cosine_subbucket_bounds_hot_label(spark):
    # one hot label (n ≫ cap) must NOT feed an unbounded all-pairs
    # stage: the adaptive LSH sub-bucket key splits it so per-block
    # pair counts stay near cap², while small labels keep the exact
    # all-pairs path (sub == 0 for every row)
    import numpy as np

    from vectordb_spark.queries.dedup import _COS_BLOCK_CAP, _cos_blocks

    rng = np.random.RandomState(7)
    n_hot, n_cold = 1200, 40
    rows = [(i, 0, [float(x) for x in rng.standard_normal(64)]) for i in range(n_hot)]
    rows += [
        (n_hot + i, 1, [float(x) for x in rng.standard_normal(64)])
        for i in range(n_cold)
    ]
    e = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    blocks = _cos_blocks(e)

    # cold label: below the cap → single exact block
    cold_subs = blocks.where(F.col("label") == 1).select("sub").distinct().collect()
    assert [r.sub for r in cold_subs] == [0]

    # hot label: 1200 rows → 3 signature bits → up to 8 sub-buckets,
    # none of which may exceed a small multiple of the cap
    hot_sizes = [
        r.n
        for r in blocks.where(F.col("label") == 0)
        .groupBy("sub")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(hot_sizes) > 1, "hot label was not split"
    assert sum(hot_sizes) == n_hot
    assert max(hot_sizes) <= 3 * _COS_BLOCK_CAP, hot_sizes

    # candidate pairs are bounded well below the unsplit n²/2
    a, b = blocks.alias("a"), blocks.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.sub") == F.col("b.sub"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).count()
    unsplit = n_hot * (n_hot - 1) // 2
    assert pairs < unsplit / 2, (pairs, unsplit)


def test_token_jaccard_subbucket_bounds_hot_block(spark):
    # a hot (lang, len_bucket) block (n ≫ cap) must NOT feed an
    # unbounded all-pairs join: the min-token-hash sub-bucket key
    # splits it, while small blocks keep the exact path (sub == 0) —
    # recall parity below the cap by construction. An exact-duplicate
    # pair inside the hot block must still land in one sub-bucket
    # (identical token set ⇒ identical min hash).
    from vectordb_spark.queries.dedup import _COS_BLOCK_CAP, _tj_blocks

    import random

    rng = random.Random(11)
    words = [f"w{i}" for i in range(400)]
    n_hot, n_cold = 700, 30
    rows = []
    for i in range(n_hot):
        rows.append((i, " ".join(rng.sample(words, 40)), "en", 320))
    rows.append((9000, rows[0][1], "en", 320))  # exact dup of doc 0
    for i in range(n_cold):
        rows.append((10000 + i, " ".join(rng.sample(words, 40)), "fr", 320))
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )
    blocks = _tj_blocks(d)

    cold_subs = blocks.where(F.col("lang") == "fr").select("sub").distinct().collect()
    assert [r.sub for r in cold_subs] == [0]

    hot = blocks.where(F.col("lang") == "en")
    hot_sizes = [
        r.n for r in hot.groupBy("sub").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert len(hot_sizes) > 1, "hot block was not split"
    assert sum(hot_sizes) == n_hot + 1
    assert max(hot_sizes) <= 3 * _COS_BLOCK_CAP, hot_sizes

    # the exact-dup pair survives the split
    subs = {
        r.doc_id: r.sub
        for r in hot.where(F.col("doc_id").isin(0, 9000)).collect()
    }
    assert subs[0] == subs[9000]


def test_minhash_band_cap_bounds_degenerate_corpus(spark):
    # a boilerplate-heavy corpus (one text repeated N times) must NOT
    # produce O(N²) LSH candidates: every band is degenerate, the cap
    # drops them all, and candidate generation stays linear
    from vectordb_spark.queries.dedup import _capped_bands, _doc_hashes

    n = 500
    rows = [(i, "lorem ipsum boiler plate text repeated everywhere") for i in range(n)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    bands = _capped_bands(_doc_hashes(d), cap=50)
    a, b = bands.alias("a"), bands.alias("b")
    cands = a.join(
        b,
        (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    assert cands.count() == 0

    # distinct texts below the cap still pair up normally
    rows = [(i, f"unique document number {i} with shared shingle tail xyz")
            for i in range(20)]
    rows += [(100 + i, "near duplicate text body alpha beta gamma") for i in range(5)]
    d2 = spark.createDataFrame(rows, "doc_id long, text string")
    bands2 = _capped_bands(_doc_hashes(d2), cap=50)
    a2, b2 = bands2.alias("a"), bands2.alias("b")
    pairs = (
        a2.join(
            b2,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .dropDuplicates()
        .count()
    )
    assert pairs >= 10  # the 5 identical docs alone give C(5,2) = 10
