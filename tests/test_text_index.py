"""Table-level inverted text index: build job, bucket-pruned BM25
search, hybrid tail merge, dead-id discipline — the lexical sibling of
test_table_index.py's IVF coverage (X3/T5 shapes, table_mvp.cpp:94-203).

The load-bearing invariant: the indexed path reproduces a naive
Python BM25 recompute over the raw corpus EXACTLY (the quantized-grid
scores of functions.text_rank are order-free BIGINTs), so an index
can be swapped in under any corpus-scan caller without result drift.
"""

from __future__ import annotations

import math

import pytest

from vectordb_spark.catalog import Warehouse
from vectordb_spark.functions.text_rank import BM25_Q

SCHEMA = {
    "name": "docs",
    "fields": [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "Body", "dataType": "STRING"},
        {"name": "Lang", "dataType": "STRING"},
        # reference requires >= 1 vector field (basic_meta_impl.cpp:456)
        {
            "name": "Vec",
            "dataType": "VECTOR_FLOAT",
            "dimensions": 2,
            "metricType": "EUCLIDEAN",
        },
    ],
}

_WORDS = ("spark", "merge", "window", "shuffle", "join", "scan", "the", "a")


def _body(i: int) -> str:
    # deterministic, varied tf/dl mix
    toks = [_WORDS[(i * 7 + j * 3) % len(_WORDS)] for j in range(5 + i % 9)]
    if i % 4 == 0:
        toks += ["spark"] * (1 + i % 3)
    return " ".join(toks)


def _rows(lo: int, hi: int) -> list[dict]:
    return [
        {
            "ID": i,
            "Body": _body(i),
            "Lang": "en" if i % 3 else "de",
            "Vec": [float(i % 7), float(i % 11)],
        }
        for i in range(lo, hi)
    ]


@pytest.fixture
def table(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = wh.load_db("txtdb").create_table(SCHEMA)
    t.insert(_rows(0, 120))
    return t


def _py_bm25(corpus: dict[int, list[str]], terms: list[str],
             allowed: set[int] | None = None,
             n: int | None = None, s: int | None = None):
    """Naive mirror of the quantized BM25: df over (filtered) corpus,
    stats (n, s) overridable to model build-time manifest staleness."""
    docs = {i: w for i, w in corpus.items() if allowed is None or i in allowed}
    n = len(corpus) if n is None else n
    s = sum(len(w) for w in corpus.values()) if s is None else s
    dfreq = {t: sum(1 for w in docs.values() if t in w) for t in terms}
    out = {}
    for i, w in docs.items():
        total, nt = 0, 0
        for t in terms:
            tf = w.count(t)
            if tf:
                idf_q = math.floor(
                    math.log((2 * n + 2) / (2 * dfreq[t] + 1)) * BM25_Q
                )
                ratio = (22 * tf * s) / (10 * tf * s + 3 * s + 9 * len(w) * n)
                total += math.floor(idf_q * ratio)
                nt += 1
        if nt:
            out[i] = (total, nt)
    return out


def _corpus(lo: int, hi: int) -> dict[int, list[str]]:
    return {i: _body(i).split(" ") for i in range(lo, hi)}


def test_build_and_exact_scores(table):
    info = table.rebuild_text_index("Body", buckets=16)
    assert info == {"field": "Body", "version": 1, "indexedRecords": 120}
    res = table.search_text_df("spark window", limit=200).collect()
    want = _py_bm25(_corpus(0, 120), ["spark", "window"])
    got = {r.ID: (r._score, r._terms) for r in res}
    assert got == want
    # descending by score, _row_id tie-break
    scores = [r._score for r in res]
    assert scores == sorted(scores, reverse=True)


def test_topk_limit_and_ordering(table):
    table.rebuild_text_index("Body", buckets=16)
    top = table.search_text_df("spark", limit=5).collect()
    assert len(top) == 5
    want = _py_bm25(_corpus(0, 120), ["spark"])
    best5 = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))[:5]
    assert [r.ID for r in top] == [i for i, _ in best5]


def test_hybrid_tail_exact(table):
    """Rows inserted after the build score through the direct-scan
    tail path; merged results still equal the full-corpus recompute
    (N/S = manifest + tail aggregate → exact when nothing deleted)."""
    table.rebuild_text_index("Body", buckets=16)
    table.insert(_rows(120, 150))
    res = table.search_text_df("merge join", limit=300).collect()
    want = _py_bm25(_corpus(0, 150), ["join", "merge"])
    assert {r.ID: (r._score, r._terms) for r in res} == want
    assert any(r.ID >= 120 for r in res)  # tail rows actually surfaced


def test_filter_prefilters_candidates_and_df(table):
    """Reference semantics: filter BEFORE rank — df counts only the
    allowed candidates (corpus stats stay global)."""
    table.rebuild_text_index("Body", buckets=16)
    res = table.search_text_df(
        "spark window", limit=300, filter="Lang = 'en'"
    ).collect()
    allowed = {i for i in range(120) if i % 3}
    want = _py_bm25(_corpus(0, 120), ["spark", "window"], allowed=allowed)
    assert {r.ID: (r._score, r._terms) for r in res} == want
    assert all(r.Lang == "en" for r in res)


def test_deleted_rows_never_surface(table):
    """Dead-id discipline: postings for rows deleted since the build
    are dropped before df counting and the top-k cut (Lucene
    convention: corpus stats stay build-time until rebuild)."""
    table.rebuild_text_index("Body", buckets=16)
    dead = [i for i in range(120) if i % 4 == 0]  # the spark-heavy docs
    table.delete(primary_keys=dead)
    res = table.search_text_df("spark", limit=300).collect()
    assert res and not any(r.ID % 4 == 0 for r in res)
    # exact vs mirror: df over survivors, stats frozen at build time
    survivors = {i for i in range(120) if i % 4}
    full = _corpus(0, 120)
    n0, s0 = len(full), sum(len(w) for w in full.values())
    want = _py_bm25(full, ["spark"], allowed=survivors, n=n0, s=s0)
    assert {r.ID: (r._score, r._terms) for r in res} == want


def test_bucket_pruning_in_plan(table):
    """The posting scan must prune to the query terms' hash buckets at
    file-listing time (PartitionFilters on _tb) — the lexical analog
    of IVF probe pruning."""
    table.rebuild_text_index("Body", buckets=16)
    # limit > _TEXT_FETCH_COLLECT_MAX keeps the whole scoring plan in
    # the returned DataFrame (the small-limit path runs it eagerly and
    # returns only the pushed-IN fetch)
    plan = (
        table.search_text_df("spark", limit=2000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "_tb" in plan
    # the small-limit fetch pushes the collected ids into the base scan
    fplan = (
        table.search_text_df("spark", limit=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "_row_id" in fplan and "PushedFilters: [In(_row_id" in fplan


def test_rebuild_versions_and_errors(table):
    v1 = table.rebuild_text_index("Body")
    table.insert(_rows(120, 130))
    v2 = table.rebuild_text_index("Body")
    assert v2["version"] == v1["version"] + 1
    assert v2["indexedRecords"] == 130
    from vectordb_spark.schema import VectorDBError

    with pytest.raises(VectorDBError):
        table.rebuild_text_index("ID")  # not a STRING field
    with pytest.raises(VectorDBError):
        table.search_text_df("   ")  # empty query
    with pytest.raises(VectorDBError):
        table.search_text_df("x", query_field="Lang")  # no index on Lang


def test_clean_index_skips_dead_id_join(table):
    """mutation_seq fast path: with no deletes since the build, the
    search plan carries NO dead-id semi-join (and no tail scan when
    the row-id cursor hasn't moved) — the plan reads the pruned
    postings plus the single top-k row fetch. After a delete the
    semi-join must reappear."""
    table.rebuild_text_index("Body", buckets=16)
    plan = (
        table.search_text_df("spark", limit=2000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" not in plan
    table.delete(primary_keys=[0])
    plan2 = (
        table.search_text_df("spark", limit=2000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan2


def test_python_xxhash64_matches_spark(spark):
    """functions/hashing.py must reproduce Spark's xxhash64 for STRING
    inputs exactly — the bucket route depends on it. Randomized +
    boundary-length + unicode inputs."""
    import random

    from pyspark.sql import functions as F

    from vectordb_spark.functions.hashing import pmod_bucket, spark_xxhash64_str

    rng = random.Random(7)
    cases = ["", "a", "spark", "w7", "née", "日本語テキスト", "x" * 31,
             "y" * 32, "z" * 33, "q" * 100]
    cases += ["".join(rng.choice("abcdefgh ") for _ in range(rng.randrange(1, 64)))
              for _ in range(100)]
    got = [
        (r[0], r[1])
        for r in spark.createDataFrame([(c,) for c in cases], "t string")
        .select(F.xxhash64("t"), F.pmod(F.xxhash64("t"), F.lit(64)))
        .collect()
    ]
    for c, (h, b) in zip(cases, got):
        assert spark_xxhash64_str(c) == h, c
        assert pmod_bucket(c, 64) == b, c


def test_refresh_appends_delta_exactly(table):
    """Incremental refresh: tail postings land in an immutable delta
    dir, stats extend, indexed_up_to advances — post-refresh scores
    equal the full-corpus recompute with NO live-tail scan (clean +
    cursor-at-head ⇒ the search plan reads only posting dirs + the
    pushed-IN fetch)."""
    table.rebuild_text_index("Body", buckets=16)
    table.insert(_rows(120, 160))
    out = table.refresh_text_index("Body")
    assert out == {"field": "Body", "version": 1, "appendedRecords": 40}
    res = table.search_text_df("spark window", limit=300).collect()
    want = _py_bm25(_corpus(0, 160), ["spark", "window"])
    assert {r.ID: (r._score, r._terms) for r in res} == want
    # second refresh with no new rows is a no-op
    assert table.refresh_text_index("Body")["appendedRecords"] == 0
    # deltas stack
    table.insert(_rows(160, 170))
    assert table.refresh_text_index("Body")["appendedRecords"] == 10
    res = table.search_text_df("merge", limit=300).collect()
    assert {r.ID: (r._score, r._terms) for r in res} == _py_bm25(
        _corpus(0, 170), ["merge"]
    )
    # full rebuild resets the delta chain
    info = table.rebuild_text_index("Body")
    assert info["version"] == 2 and info["indexedRecords"] == 170


def test_refresh_after_delete_keeps_exactness(table):
    """Deletes between build and refresh: dead postings in the main
    dir drop via the mutation_seq semi-join; the delta still indexes
    the tail; stats = build-time N/S + refresh-time tail N/S (the
    Lucene stale-stats convention, rebuilt away by a full rebuild)."""
    table.rebuild_text_index("Body", buckets=16)
    full = _corpus(0, 120)
    n0, s0 = len(full), sum(len(w) for w in full.values())
    table.delete(primary_keys=[1, 5, 9])
    table.insert(_rows(120, 140))
    table.refresh_text_index("Body")
    res = table.search_text_df("spark shuffle", limit=300).collect()
    corpus = _corpus(0, 140)
    tail = _corpus(120, 140)
    n = n0 + len(tail)
    s = s0 + sum(len(w) for w in tail.values())
    survivors = set(corpus) - {1, 5, 9}
    want = _py_bm25(corpus, ["shuffle", "spark"], allowed=survivors, n=n, s=s)
    assert {r.ID: (r._score, r._terms) for r in res} == want


def _py_phrase_bm25(corpus, phrase, allowed=None, n=None, s=None):
    """Phrase-as-pseudo-term mirror: tf = overlapping start positions."""
    docs = {i: w for i, w in corpus.items() if allowed is None or i in allowed}
    n = len(corpus) if n is None else n
    s = sum(len(w) for w in corpus.values()) if s is None else s
    L = len(phrase)
    tfs = {
        i: sum(1 for j in range(len(w) - L + 1) if w[j : j + L] == phrase)
        for i, w in docs.items()
    }
    m = {i: tf for i, tf in tfs.items() if tf > 0}
    df = len(m)
    out = {}
    for i, tf in m.items():
        idf_q = math.floor(math.log((2 * n + 2) / (2 * df + 1)) * BM25_Q)
        dl = len(docs[i])
        ratio = (22 * tf * s) / (10 * tf * s + 3 * s + 9 * dl * n)
        out[i] = (math.floor(idf_q * ratio), 1)
    return out


def test_phrase_search_exact(table):
    """Exact-phrase search from positional postings: adjacency via the
    start-position chain, phrase-as-pseudo-term BM25, all from the
    pruned index — equality against the naive sliding-window mirror.
    'spark spark' also pins OVERLAPPING occurrence counting."""
    table.rebuild_text_index("Body", buckets=16)
    # _body chains tokens with stride 3, so (merge → join) and the
    # appended (spark → spark) run are REAL adjacencies; a reversed
    # pair like (join → merge) never occurs — each case asserts a
    # non-empty expectation where one exists
    cases = [["merge", "join"], ["spark", "spark"], ["the", "merge", "a"]]
    assert _py_phrase_bm25(_corpus(0, 120), cases[0])  # non-vacuous
    for phrase in cases:
        res = table.search_text_df(
            " ".join(phrase), limit=300, phrase=True
        ).collect()
        want = _py_phrase_bm25(_corpus(0, 120), phrase)
        assert {r.ID: (r._score, r._terms) for r in res} == want, phrase
    # docs inserted after the build resolve through the tail path too
    table.insert(_rows(120, 150))
    res = table.search_text_df("merge join", limit=300, phrase=True).collect()
    want = _py_phrase_bm25(_corpus(0, 150), ["merge", "join"])
    assert want and {r.ID: (r._score, r._terms) for r in res} == want


def test_phrase_vs_bag_of_words_differ(table):
    """Sanity: the phrase result is a strict subset of the AND-of-terms
    docs — order matters."""
    table.rebuild_text_index("Body", buckets=16)
    ph = {r.ID for r in table.search_text_df("the spark", limit=300, phrase=True).collect()}
    bag = {r.ID for r in table.search_text_df("the spark", limit=300).collect()
           if r._terms == 2}
    assert ph and ph < bag


def test_vacuum_reclaims_superseded_index_versions(table):
    """Rebuild supersedes the v1 dirs (main + deltas); vacuum with
    zero grace reclaims them while the live v2 dir and a reader
    planned against it survive."""
    import os

    table.rebuild_text_index("Body", buckets=16)
    table.insert(_rows(120, 130))
    table.refresh_text_index("Body")
    v1_dirs = [
        d for d in os.listdir(table.path) if d.startswith("textindex_Body_v1")
    ]
    assert len(v1_dirs) == 2  # main + delta
    table.rebuild_text_index("Body", buckets=16)
    out = table.vacuum(grace_seconds=0)
    assert out["removedSegments"] >= 2
    left = {d for d in os.listdir(table.path) if d.startswith("textindex_")}
    assert left == {"textindex_Body_v2"}
    # index still serves
    assert table.search_text_df("spark", limit=3).count() == 3


def test_multi_field_weighted_search(table):
    """BM25F-style multi-field search: per-field quantized BM25 scores
    combined with integer weights — exact vs the per-field mirrors
    (each field keeps its own dl normalization and df)."""
    table.rebuild_text_index("Body", buckets=16)
    table.rebuild_text_index("Lang", buckets=16)
    res = table.search_text_multi_df(
        "en spark", {"Body": 2, "Lang": 3}, limit=300
    ).collect()
    body = _py_bm25(_corpus(0, 120), ["en", "spark"])
    langs = {i: ["en" if i % 3 else "de"] for i in range(120)}
    lang = _py_bm25(langs, ["en", "spark"])
    want = {}
    for i in set(body) | set(lang):
        bs, bt = body.get(i, (0, 0))
        ls, lt = lang.get(i, (0, 0))
        want[i] = (2 * bs + 3 * ls, bt + lt)
    assert {r.ID: (r._score, r._terms) for r in res} == want
    # errors: empty weights / non-integer weight / unindexed field
    from vectordb_spark.schema import VectorDBError

    with pytest.raises(VectorDBError):
        table.search_text_multi_df("x", {})
    with pytest.raises(VectorDBError):
        table.search_text_multi_df("x", {"Body": 1.5})
    with pytest.raises(VectorDBError):
        table.search_text_multi_df("x", {"Source": 1})


def test_reader_survives_rebuild_swap(table):
    """Version-swap safety: a search DataFrame PLANNED against index
    v1 still collects correct results after a v2 rebuild replaces the
    manifest pointer (v1's dirs stay on disk until vacuum), and new
    searches pick up v2 — the lock-free double-buffer discipline the
    vector index already guarantees (reference X3: readers never block
    on rebuild)."""
    table.rebuild_text_index("Body", buckets=16)
    stale = table.search_text_df("spark window", limit=2000)  # planned vs v1
    table.insert(_rows(120, 140))
    table.rebuild_text_index("Body", buckets=16)  # v2 swap
    # the stale plan is a consistent v1 SNAPSHOT: planned when the
    # corpus was 120 docs with no tail, it still collects exactly the
    # v1-era answer after the swap (v1's dirs are immutable and stay
    # on disk until vacuum) — never an error, never a v1/v2 mix
    got_stale = {r.ID: (r._score, r._terms) for r in stale.collect()}
    assert got_stale == _py_bm25(_corpus(0, 120), ["spark", "window"])
    # a fresh plan sees v2: the full 140-doc corpus, no tail
    got_new = {
        r.ID: (r._score, r._terms)
        for r in table.search_text_df("spark window", limit=2000).collect()
    }
    assert got_new == _py_bm25(_corpus(0, 140), ["spark", "window"])
