"""Python UDTF surface: the chunking table function and its parity
with a plain-Python reference chunker."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_spark.functions.udtf import ChunkDocument, register


def _ref_chunks(doc: str, size: int, overlap: int):
    out = []
    if not doc:
        return out
    stride = max(1, size - overlap)
    i = idx = 0
    while i < len(doc):
        piece = doc[i : i + size]
        out.append((idx, i, piece, len(piece)))
        if i + size >= len(doc):
            break
        i += stride
        idx += 1
    return out


def test_udtf_direct_call(spark):
    rows = ChunkDocument(F.lit("abcdefghij"), F.lit(4), F.lit(1))
    got = [tuple(r) for r in spark.range(1).lateralJoin(rows).drop("id").collect()]
    assert got == _ref_chunks("abcdefghij", 4, 1)
    # boundary rule: a chunk that reaches the end stops the loop even
    # though the stride would still fit another start offset
    assert got[-1][1] + got[-1][3] == 10


def test_udtf_sql_lateral(spark):
    register(spark)
    docs = [
        (0, ""),  # empty doc yields nothing
        (1, "x" * 250),
        (2, "hello world, this is a chunking test of moderate length."),
    ]
    spark.createDataFrame(docs, "doc_id long, body string").createOrReplaceTempView(
        "udtf_docs"
    )
    got = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.start, c.chunk, c.n_chars
        FROM udtf_docs d, LATERAL chunk_document(d.body, 100, 20) c
        ORDER BY d.doc_id, c.chunk_idx
        """
    ).collect()
    want = [
        (did, *chunk)
        for did, body in docs
        for chunk in _ref_chunks(body, 100, 20)
    ]
    assert [tuple(r) for r in got] == want
    assert not any(r.doc_id == 0 for r in got)
    # reconstruction: dropping each chunk's overlap prefix re-yields the doc
    for did, body in docs[1:]:
        parts = [r for r in got if r.doc_id == did]
        rebuilt = parts[0].chunk + "".join(p.chunk[20:] for p in parts[1:])
        assert rebuilt == body
