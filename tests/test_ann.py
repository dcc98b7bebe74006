"""ANN index agreement tests — the reference's discipline: indexed and
brute-force paths must agree (db_server.cpp:1606-1612 asserts identical
orderings before/after Rebuild; for IVF/LSH the bar is recall@k)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_spark.operators import ann as A
from vectordb_spark.operators.knn import knn

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    yield df
    # a lingering cache would shadow the parquet scan for every later
    # test reading this path (plan audits would see InMemoryRelation)
    df.unpersist()


@pytest.fixture(scope="module")
def qv(emb):
    return [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]


def test_ivf_recall_vs_exact(emb, qv):
    exact = knn(emb, "embedding", qv, 10, metric="EUCLIDEAN", id_col="vec_id")
    idx = A.IVFIndex(k=16, seed=42)
    indexed = idx.build(emb, "embedding")
    # The synthetic embeddings are near-random in 64-d (no cluster
    # structure: every centroid ends up ~equidistant), so IVF recall is
    # the honest high-dim tradeoff curve: measured 0.4/0.7/0.9 recall@10
    # at nprobe 4/8/12 of 16. Assert the nprobe=8 point.
    approx = idx.search(indexed, "embedding", qv, 10, nprobe=8, id_col="vec_id")
    r = A.recall_at_k(approx, exact, "vec_id", 10)
    assert r >= 0.6, f"recall@10 {r} too low for nprobe=8/16"
    # full probe == exact (the brute-force fallback property, T8)
    full = idx.search(indexed, "embedding", qv, 10, nprobe=16, id_col="vec_id")
    assert A.recall_at_k(full, exact, "vec_id", 10) == 1.0


def test_ivf_rebuild_stable(emb, qv):
    # rebuild with the same seed → identical assignments → identical results
    idx1, idx2 = A.IVFIndex(k=8, seed=7), A.IVFIndex(k=8, seed=7)
    r1 = idx1.search(idx1.build(emb, "embedding"), "embedding", qv, 5, id_col="vec_id")
    r2 = idx2.search(idx2.build(emb, "embedding"), "embedding", qv, 5, id_col="vec_id")
    assert [x.vec_id for x in r1.collect()] == [x.vec_id for x in r2.collect()]


def test_lsh_bucket_contains_query(emb, qv):
    sig_s, _ = A.lsh_signature_exprs("embedding")
    sigs = emb.withColumn("sig", F.expr(sig_s))
    qsig = A.lsh_signature_of(qv)
    bucket_ids = {r.vec_id for r in sigs.where(F.col("sig") == qsig).collect()}
    assert 0 in bucket_ids  # the query vector hashes into its own bucket
    # bucket is a real pruning (not everything in one bucket)
    assert len(bucket_ids) < emb.count() / 4


def _blob_df(spark, n_blobs=16, per_blob=120, dim=16, seed=7):
    """Gaussian blobs: the clustered regime IVF is designed for."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_blobs, dim)) * 6.0
    rows = []
    vid = 0
    for b in range(n_blobs):
        pts = centers[b] + rng.standard_normal((per_blob, dim))
        for p in pts:
            rows.append((vid, b, [float(x) for x in p]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, blob int, embedding array<float>"
    )


def test_ivf_autoprobe_recall_on_clustered_data(spark):
    # the production regime: clustered vectors. Auto-probe (re-rank
    # default) must reach recall ≥ 0.9 while scanning ≤ 25% of rows.
    import numpy as np

    d = _blob_df(spark).cache()
    try:
        rng = np.random.RandomState(99)
        idx = A.IVFIndex(k=16, seed=42)
        indexed = idx.build(d, "embedding").cache()
        total = d.count()
        recalls, scans = [], []
        for r in d.where(F.col("vec_id").isin([0, 333, 777, 1500, 1903])).collect():
            qv = [float(x) + float(e) * 0.05
                  for x, e in zip(r.embedding, rng.standard_normal(len(r.embedding)))]
            exact = knn(d, "embedding", qv, 10, metric="EUCLIDEAN", id_col="vec_id")
            probes = idx.plan_probes(qv, 10)
            scanned = sum(idx.cluster_sizes[c] for c in probes)
            approx = idx.search(indexed, "embedding", qv, 10, id_col="vec_id")
            recalls.append(A.recall_at_k(approx, exact, "vec_id", 10))
            scans.append(scanned / total)
        assert min(recalls) >= 0.9, f"recalls={recalls} scans={scans}"
        assert max(scans) <= 0.25 + 1e-9, f"scanned too much: {scans}"
    finally:
        d.unpersist()


def test_ivf_autoprobe_caps_scan_fraction(emb, qv):
    # even on clusterless data, auto-probe never plans past the 25% cap
    idx = A.IVFIndex(k=16, seed=42)
    idx.build(emb, "embedding")
    probes = idx.plan_probes(qv, 10)
    total = sum(idx.cluster_sizes.values())
    scanned = sum(idx.cluster_sizes[c] for c in probes)
    # the last cluster may overshoot the target; all but it fit the cap
    before_last = scanned - idx.cluster_sizes[probes[-1]]
    assert before_last <= 0.25 * total
    assert len(probes) >= 1


def test_multiprobe_signature_shells():
    qsig = 0b1010_0110
    h1 = A.multiprobe_signatures(qsig, radius=1)
    h2 = A.multiprobe_signatures(qsig, radius=2)
    assert len(h1) == len(set(h1)) == 9
    assert len(h2) == len(set(h2)) == 37
    assert set(h1) <= set(h2)
    for s in h2:
        assert bin(s ^ qsig).count("1") <= 2
        assert 0 <= s < 256


def test_lsh_hamming2_recall_dominates_hamming1(emb, qv):
    # radius-2 probing strictly contains the radius-1 candidate pool,
    # so its recall dominates; the scan stays a bounded fraction
    exact = knn(emb, "embedding", qv, 10, metric="EUCLIDEAN", id_col="vec_id")
    sig_s, _ = A.lsh_signature_exprs("embedding")
    sigs = emb.withColumn("sig", F.expr(sig_s))
    qsig = A.lsh_signature_of(qv)
    p1 = A.multiprobe_signatures(qsig, radius=1)
    p2 = A.multiprobe_signatures(qsig, radius=2)
    m1 = knn(sigs.where(F.col("sig").isin(p1)), "embedding", qv, 10,
             metric="EUCLIDEAN", id_col="vec_id")
    m2 = knn(sigs.where(F.col("sig").isin(p2)), "embedding", qv, 10,
             metric="EUCLIDEAN", id_col="vec_id")
    r1 = A.recall_at_k(m1, exact, "vec_id", 10)
    r2 = A.recall_at_k(m2, exact, "vec_id", 10)
    assert r2 >= r1
    n1 = sigs.where(F.col("sig").isin(p1)).count()
    n2 = sigs.where(F.col("sig").isin(p2)).count()
    assert n1 <= n2 < emb.count() / 2  # 37/256 buckets ≈ 14% expected


def test_ivf_exact_fallback_on_unclusterable_data(spark, emb, qv):
    # random 64-d vectors: separation stats must detect that probing
    # cannot carry recall and auto-probe must fall back to exact
    idx = A.IVFIndex(k=16, seed=42)
    indexed = idx.build(emb, "embedding")
    assert idx.separation_ratio < idx.SEPARATION_EXACT_FALLBACK
    exact = knn(emb, "embedding", qv, 10, metric="EUCLIDEAN", id_col="vec_id")
    res = idx.search(indexed, "embedding", qv, 10, id_col="vec_id")
    assert idx.last_search_exact_fallback
    assert A.recall_at_k(res, exact, "vec_id", 10) == 1.0
    # a pinned nprobe disables the fallback (the explicit knob wins)
    idx.search(indexed, "embedding", qv, 10, nprobe=2, id_col="vec_id").collect()
    assert not idx.last_search_exact_fallback


def test_ivf_fallback_ranks_with_pq_adc_when_attached(spark, emb, qv):
    # the unclusterable-corpus fallback with an attached PQ index must
    # take the stored-code ADC path (full scan of the 4-byte code
    # column + exact re-rank) and hold recall, instead of raw-float
    # brute force
    import vectordb_spark.operators.pq as PQ

    idx = A.IVFIndex(k=16, seed=42)
    indexed = idx.build(emb, "embedding")
    assert idx.separation_ratio < idx.SEPARATION_EXACT_FALLBACK
    pq = PQ.PQIndex(seed=42).fit(emb, "embedding")
    with_codes = pq.codes(indexed, "embedding").cache()
    try:
        idx.attach_pq(pq)
        exact = knn(emb, "embedding", qv, 10, metric="EUCLIDEAN", id_col="vec_id")
        res = idx.search(with_codes, "embedding", qv, 10, id_col="vec_id")
        assert idx.last_search_exact_fallback
        assert idx.last_search_path == "pq_adc"
        assert "_cluster" not in res.columns
        assert A.recall_at_k(res, exact, "vec_id", 10) >= 0.9
        # without the code column the fallback stays raw exact
        idx.search(indexed, "embedding", qv, 10, id_col="vec_id").collect()
        assert idx.last_search_path == "exact"
    finally:
        with_codes.unpersist()


def test_ivf_no_fallback_on_clustered_data(spark):
    # Gaussian blobs: separation stats must keep the probed path
    d = _blob_df(spark, per_blob=60).cache()
    try:
        idx = A.IVFIndex(k=16, seed=42)
        indexed = idx.build(d, "embedding")
        assert idx.separation_ratio > idx.SEPARATION_EXACT_FALLBACK
        q = [float(x) for x in d.where(F.col("vec_id") == 0).head()["embedding"]]
        idx.search(indexed, "embedding", q, 10, id_col="vec_id").collect()
        assert not idx.last_search_exact_fallback
    finally:
        d.unpersist()


def test_sq8_quantization_error_bound(emb):
    # |x - q·scale| ≤ scale/2 per element, scale = max|x|/127: the
    # dequantization error bound that makes the re-rank candidate set
    # trustworthy
    from vectordb_spark.operators.quant import quant_scale_exprs, quantize_exprs

    scale_s, _ = quant_scale_exprs("embedding")
    qz_s, _ = quantize_exprs("embedding", "scale")
    rows = (
        emb.withColumn("scale", F.expr(scale_s))
        .withColumn("q", F.expr(qz_s))
        .select("embedding", "scale", "q")
        .limit(50)
        .collect()
    )
    assert rows
    for r in rows:
        for x, qi in zip(r.embedding, r.q):
            assert abs(float(x) - qi * r.scale) <= r.scale / 2 + 1e-12
            # x/scale ∈ [-127, 127] ⇒ floor(·+0.5) ∈ [-127, 127]
            assert -127 <= qi <= 127


def test_sq8_rerank_recall_vs_exact(spark, emb, qv):
    # the quantized-scan candidates re-ranked exactly must recover the
    # true top-10 (refine=50 ≫ the approximation error displacement)
    from vectordb_spark.queries.ann import ann_sq8_rerank

    exact = knn(emb, "embedding", qv, 10, metric="DOT_PRODUCT", id_col="vec_id")
    approx = ann_sq8_rerank(spark, SF)
    r = A.recall_at_k(approx, exact, "vec_id", 10)
    assert r == 1.0, f"sq8-rerank recall@10 {r}"


def test_lsh_multiprobe_recall_dominates_single_bucket(spark, emb, qv):
    # hamming-1 multi-probe must include the single bucket's candidates
    # and strictly widen the candidate pool (9/256 buckets vs 1/256),
    # so its recall@10 vs exact is >= the single-bucket recall
    exact = knn(emb, "embedding", qv, 10, metric="EUCLIDEAN", id_col="vec_id")
    sig_s, _ = A.lsh_signature_exprs("embedding")
    sigs = emb.withColumn("sig", F.expr(sig_s))
    qsig = A.lsh_signature_of(qv)
    probes = [qsig] + [qsig ^ (1 << i) for i in range(8)]
    single = knn(
        sigs.where(F.col("sig") == qsig), "embedding", qv, 10,
        metric="EUCLIDEAN", id_col="vec_id",
    )
    multi = knn(
        sigs.where(F.col("sig").isin(probes)), "embedding", qv, 10,
        metric="EUCLIDEAN", id_col="vec_id",
    )
    r1 = A.recall_at_k(single, exact, "vec_id", 10)
    r9 = A.recall_at_k(multi, exact, "vec_id", 10)
    assert r9 >= r1
    # candidate pool strictly grows but stays a small scan fraction
    n1 = sigs.where(F.col("sig") == qsig).count()
    n9 = sigs.where(F.col("sig").isin(probes)).count()
    assert n1 < n9 < emb.count() / 4


def test_build_lloyd_deterministic_and_persistable(spark):
    """Seeded-Lloyd trainer: deterministic across runs, ties to the
    lowest cluster, centroids move after training, and the assignment
    column is the argmin of the trained centroids (the invariant the
    table_ivf_trained_search oracle replays in SQL)."""
    import numpy as np

    from vectordb_spark.operators.ann import IVFIndex

    rng = np.random.default_rng(7)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=8)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    a = IVFIndex(k=4, seed=1)
    out_a = a.build_lloyd(df, "embedding", rounds=2, id_col="vec_id")
    b = IVFIndex(k=4, seed=1)
    b.build_lloyd(df, "embedding", rounds=2, id_col="vec_id")
    assert a.centroids == b.centroids  # bit-identical, not just close

    seeds = [r[1] for r in rows[:4]]
    moved = [c for c, s in zip(a.centroids, seeds) if c != s]
    assert moved, "two Lloyd rounds must move the seed centroids"

    # assignment == argmin over the trained centroids
    got = {r["vec_id"]: r["_cluster"] for r in out_a.collect()}
    cents = np.asarray(a.centroids)
    for vid, vec in rows[:50]:
        d = ((cents - np.asarray(vec, dtype=np.float64)) ** 2).sum(axis=1)
        assert got[vid] == int(np.argmin(d))


def test_rebuild_lloyd_manifest_roundtrip(spark, tmp_path):
    """rebuild(train='lloyd') persists trained centroids; a FRESH
    Table serves a probe search from the manifest alone and the result
    is the exact KNN restricted to the probed cells."""
    import numpy as np

    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.table import Table

    rng = np.random.default_rng(11)
    schema = TableSchema(
        name="tl",
        fields=[
            FieldSchema(name="vec_id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(
                name="emb", field_type=FieldType.VECTOR_FLOAT,
                dimension=4, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, str(tmp_path / "tl"))
    t._init_storage()
    rows = [
        (int(i), [float(x) for x in rng.normal(size=4)]) for i in range(120)
    ]
    t.insert_df(
        spark.createDataFrame(rows, "vec_id long, emb array<float>")
        .orderBy("vec_id").coalesce(1)
    )
    t.rebuild("emb", index_type="IVF", k=4, train="lloyd", rounds=2)

    t2 = Table(spark, schema, str(tmp_path / "tl"))
    info = t2._load_meta()["indexes"]["emb"]
    assert info["train"] == "lloyd" and info["rounds"] == 2
    cents = np.asarray(info["centroids"])
    q = [0.5, -0.5, 0.25, 0.0]
    got = [
        r["vec_id"]
        for r in t2.search_indexed_df(q, limit=5, nprobe=2).collect()
    ]

    dq = ((cents - np.asarray(q)) ** 2).sum(axis=1)
    probed = set(np.argsort(dq, kind="stable")[:2].tolist())
    cand = []
    for vid, vec in rows:
        dv = ((cents - np.asarray(vec, dtype=np.float64)) ** 2).sum(axis=1)
        if int(np.argmin(dv)) in probed:
            d = float(((np.asarray(vec, dtype=np.float64) - np.asarray(q)) ** 2).sum())
            cand.append((d, vid))
    want = [vid for _, vid in sorted(cand)[:5]]
    assert got == want


def test_build_lloyd_sampled_training_subset(spark):
    """Sampled seeded-Lloyd (r10): train_mod/train_keep restrict seeds
    and the per-round mean aggregates to the deterministic prime-mod hash
    subset, the FINAL assignment still covers every row, and the whole
    thing equals a hand-run Lloyd over exactly that subset — the
    invariant the table_ivf_sampled_train_search oracle replays."""
    import numpy as np

    from vectordb_spark.operators.ann import IVFIndex

    rng = np.random.default_rng(23)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=6)]) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    mod, keep = 4, 1
    P, H = IVFIndex.TRAIN_HASH_PRIME, IVFIndex.TRAIN_HASH_MULT
    train_ids = [i for i, _ in rows if ((i % P) * H) % P % mod < keep]
    assert 0 < len(train_ids) < len(rows)

    a = IVFIndex(k=4, seed=1)
    out = a.build_lloyd(
        df, "embedding", rounds=2, id_col="vec_id",
        train_mod=mod, train_keep=keep,
    )
    # full-corpus assignment despite sampled training
    assert out.count() == len(rows)

    # replay: seeds = 4 smallest sampled ids; two rounds of grid-mean
    # Lloyd over ONLY the sampled vectors
    by_id = dict(rows)
    cents = [np.asarray(by_id[i], dtype=np.float64) for i in sorted(train_ids)[:4]]
    X = np.asarray([by_id[i] for i in sorted(train_ids)], dtype=np.float64)
    for _ in range(2):
        d2 = ((X[:, None, :] - np.asarray(cents)[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        nxt = []
        for c in range(4):
            m = assign == c
            if m.any():
                g = np.floor(X[m] * 1e12 + 0.5)
                nxt.append((g.sum(axis=0) / 1e12) / m.sum())
            else:
                nxt.append(np.asarray(cents[c]))
        cents = nxt
    got = np.asarray(a.centroids)
    assert np.allclose(got, np.asarray(cents), atol=1e-9), (got, cents)

    # differs from the full-corpus trainer (sampling is load-bearing)
    b = IVFIndex(k=4, seed=1)
    b.build_lloyd(df, "embedding", rounds=2, id_col="vec_id")
    assert a.centroids != b.centroids

    # half-set params rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        IVFIndex(k=4, seed=1).build_lloyd(
            df, "embedding", id_col="vec_id", train_mod=4
        )


def test_rebuild_sampled_requires_lloyd(spark, tmp_path):
    from vectordb_spark.schema import (
        FieldSchema,
        FieldType,
        TableSchema,
        VectorDBError,
    )
    from vectordb_spark.table import Table

    schema = TableSchema(
        name="ts",
        fields=[
            FieldSchema(name="vec_id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(
                name="emb", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, str(tmp_path / "ts"))
    t._init_storage()
    t.insert_df(
        spark.createDataFrame(
            [(i, [float(i), 0.0]) for i in range(40)],
            "vec_id long, emb array<float>",
        ).coalesce(1)
    )
    import pytest as _pytest

    with _pytest.raises(VectorDBError):
        t.rebuild("emb", index_type="IVF", k=2, train="kmeans", train_mod=4, train_keep=1)
    # and the valid sampled-lloyd path persists its hash filter
    t.rebuild(
        "emb", index_type="IVF", k=2, train="lloyd", rounds=1,
        train_mod=2, train_keep=1,
    )
    info = t._load_meta()["indexes"]["emb"]
    assert info["train_mod"] == 2 and info["train_keep"] == 1


def test_train_hash_negative_ids_uniform_rate(spark):
    """r11 (ADVICE r10): the sampled-trainer hash is a NORMALIZED
    non-negative residue, so negative ids sample at the same ~keep/mod
    rate as positive ones (the sign-carrying form kept ~100% of
    negative ids: h < 0 is below every keep threshold). Also pins the
    SQL form == Python floor-mod on BOTH signs — the replay identity
    the pytest oracles rely on."""
    from pyspark.sql import functions as F

    from vectordb_spark.operators.ann import IVFIndex

    P, H = IVFIndex.TRAIN_HASH_PRIME, IVFIndex.TRAIN_HASH_MULT
    ids = list(range(-500, 0)) + list(range(500))
    df = spark.createDataFrame([(i,) for i in ids], "vec_id long")
    mod, keep = 4, 1
    kept = (
        df.where(
            F.expr(IVFIndex.train_hash_sql("vec_id")) % mod < keep
        )
        .select("vec_id")
        .collect()
    )
    kept_ids = sorted(r[0] for r in kept)
    # Python floor-mod replay matches the SQL bit-for-bit on all ids
    replay = sorted(i for i in ids if ((i % P) * H) % P % mod < keep)
    assert kept_ids == replay
    neg = sum(1 for i in kept_ids if i < 0)
    pos = sum(1 for i in kept_ids if i >= 0)
    # both signs near the ~1/4 rate — the old form kept all 500 negatives
    assert 500 * 0.1 < neg < 500 * 0.45
    assert 500 * 0.1 < pos < 500 * 0.45
