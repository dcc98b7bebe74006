"""Python UDTF surface (SURVEY §2.10 — the reference has no
user-definable functions of any kind; Spark 4 gives all three
legs: vectorized UDFs, grouped-map UDAF-style aggregation, and table
functions).

The table function here is the honest use case: one document row in,
a VARIABLE number of chunk rows out, with per-row state (running
offsets) that a relational explode can express only by materializing
the chunk index list first. The relational twin
(queries/pipeline.py::chunk_documents_overlap) stays the 100 TB
default — a UDTF is row-at-a-time Python and belongs at the boundary
where chunking rules become genuinely procedural (tokenizer-aware
splits, sentence packing); parity between the two is pinned in
tests/test_udtf.py.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, start int, chunk string, n_chars int")
class ChunkDocument:
    """Fixed-width character chunks with overlap — eval() receives one
    (doc, size, overlap) row and yields one row per chunk. Matches the
    relational chunker's boundary rule: stride = size - overlap, last
    chunk may be short, empty docs yield nothing."""

    def eval(self, doc: str, size: int, overlap: int):  # noqa: D102
        if not doc:
            return
        stride = max(1, size - overlap)
        i = idx = 0
        while i < len(doc):
            piece = doc[i : i + size]
            yield idx, i, piece, len(piece)
            if i + size >= len(doc):
                break
            i += stride
            idx += 1


def register(spark) -> None:
    """Expose the table function to SQL:
    ``SELECT c.* FROM docs, LATERAL chunk_document(body, 100, 20) c``."""
    spark.udtf.register("chunk_document", ChunkDocument)
