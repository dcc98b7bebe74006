"""Embedding service (reference E1/E2, SURVEY.md §2.12).

The reference POSTs batches of strings to an embedding sidecar
(engine/services/embedding_service.cpp:47-214, provider-keyed). Here the
embedder is pluggable:

- ``MockEmbedder`` — deterministic, dependency-free: hash n-grams into a
  fixed-dim float32 vector, L2-normalized. Used by tests and anywhere a
  real provider isn't configured. Deterministic ⇒ oracle-checkable.
- ``HttpEmbedder`` — batch HTTP POST shaped like the reference's
  OpenAI-style call; constructed lazily so no network dependency at
  import. Stubbed operational (no providers in this environment).

Embedding runs as an Arrow-batched pandas UDF over the column — the
Spark-side plumbing (batching, schema, distribution) is identical for
both embedders.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


class MockEmbedder:
    """Deterministic text → unit float32 vector.

    Character-trigram hashing: each trigram adds ±1 to a bucket chosen
    by a stable blake2b hash. Stable across processes/partitions (no
    PYTHONHASHSEED dependence).
    """

    def __init__(self, dimension: int = 16):
        self.dimension = dimension

    def embed_batch(self, texts: Iterable[str]) -> list[list[float]]:
        return [self._one(t) for t in texts]

    def _one(self, text: str) -> list[float]:
        dim = self.dimension
        v = np.zeros(dim, dtype=np.float64)
        t = f"^{text}$"
        for i in range(len(t) - 2):
            h = hashlib.blake2b(t[i : i + 3].encode("utf-8"), digest_size=8).digest()
            x = int.from_bytes(h, "little")
            v[x % dim] += 1.0 if (x >> 32) & 1 else -1.0
        n = float(np.linalg.norm(v))
        if n > 0:
            v /= n
        return [float(np.float32(x)) for x in v]


class SqlMockEmbedder:
    """Deterministic text → signed trigram-count vector with THREE
    bit-identical implementations: Python (this class), a Spark Column
    expression (:meth:`spark_expr`), and DuckDB SQL (:meth:`duck_expr`).

    Purpose: make the reference's E1/E2 auto-embed → semantic-search
    loop (db_server.cpp:512-600 — embed the query with the index's
    model, then the ordinary KNN path) *oracle-checkable*. The original
    ``MockEmbedder`` hashes trigrams with blake2b, which no SQL engine
    exposes; this embedder replaces the hash with pure integer
    arithmetic both engines evaluate identically:

    - normalize: ``'^' || regexp_replace(lower(text), '[^a-z0-9 ]', '') || '$'``
    - per trigram at i: ``h = (ord(t[i])*131 + ord(t[i+1]))*131 + ord(t[i+2])``
    - bucket ``h % dim`` accumulates ``1 - 2*((h // dim) % 2)`` (±1)

    The vector stays INTEGER (no normalization): cosine distance is
    scale-invariant, so ranking is unchanged, and integer dot products
    are exact in any evaluation order — the only float ops are one
    sqrt and one division per row, each correctly rounded IEEE in both
    engines → bit-identical distances. Callers that need a unit vector
    (the Table COSINE ingest path, table_mvp.cpp:334-349) normalize
    downstream with ``normalized=False`` cosine or an explicit L2 step.
    """

    def __init__(self, dimension: int = 16):
        self.dimension = dimension

    # -- Python path (Arrow pandas UDF via embed_column) ------------

    def embed_batch(self, texts: Iterable[str]) -> list[list[float]]:
        return [self._one(t) for t in texts]

    def _one(self, text: str) -> list[float]:
        import re

        dim = self.dimension
        t = "^" + re.sub(r"[^a-z0-9 ]", "", (text or "").lower()) + "$"
        v = [0] * dim
        for i in range(len(t) - 2):
            h = (ord(t[i]) * 131 + ord(t[i + 1])) * 131 + ord(t[i + 2])
            v[h % dim] += 1 - 2 * ((h // dim) % 2)
        return [float(x) for x in v]

    # -- Spark Column path (JVM codegen, no Python in the hot loop) --

    def spark_norm_expr(self, col: str) -> Column:
        """Stage 1: cleaned '^…$' text. MUST be materialized as its own
        projection (see :meth:`embed_df`): higher-order-function lambdas
        re-evaluate non-attribute subexpressions PER ELEMENT, so
        inlining this under the trigram transform would run the regexp
        once per trigram instead of once per row."""
        return F.expr(
            f"concat('^', regexp_replace(lower({col}), '[^a-z0-9 ]', ''), '$')"
        )

    def spark_codes_expr(self, t_col: str) -> Column:
        """Stage 2: array<int> of code points over the cleaned-text
        ATTRIBUTE ``t_col``. split('')+ascii is O(n); the naive
        per-position substr is an O(n) UTF8 scan PER CALL — O(n²) per
        document, which at web-document lengths dominates everything.
        The empty-string filter guards Spark versions that keep a
        trailing '' from split."""
        return F.expr(
            f"transform(filter(split({t_col}, ''), c -> c <> ''), c -> ascii(c))"
        )

    def spark_hashes_expr(self, cs_col: str) -> Column:
        """Stage 3: array<int> trigram hashes by O(1) indexing into the
        code-point ATTRIBUTE ``cs_col``."""
        return F.expr(
            f"transform(CASE WHEN size({cs_col}) >= 3 "
            f"THEN sequence(2, size({cs_col}) - 1) ELSE array() END, "
            f"i -> (element_at({cs_col}, i-1)*131 "
            f"+ element_at({cs_col}, i))*131 + element_at({cs_col}, i+1))"
        )

    def spark_vector_expr(self, hl_col: str) -> Column:
        """Stage 4: array<bigint> signed bucket counts over the hash
        ATTRIBUTE ``hl_col``. CollapseProject inlines a once-referenced
        alias, so ``hl_col``'s expression is re-evaluated per bucket —
        harmless once it is pure int-array indexing (dim × n_trigrams
        int ops), which is why stage 2 materializes code points."""
        dim = self.dimension
        return F.expr(
            f"transform(sequence(0, {dim - 1}), "
            f"b -> aggregate({hl_col}, CAST(0 AS BIGINT), "
            f"(acc, h) -> acc + CASE WHEN h % {dim} = b "
            f"THEN 1 - 2*((h div {dim}) % 2) ELSE 0 END))"
        )

    def embed_df(self, df, col: str, out: str = "emb"):
        """``df`` + array<bigint> embedding column ``out`` — chained
        projections so the expensive stages (regexp normalize, O(n)
        code-point extraction) evaluate once per row: Catalyst's
        CollapseProject declines to merge a non-cheap alias referenced
        more than once, which holds for ``_emb_t`` (3 refs) and
        ``_emb_cs`` (4 refs)."""
        return (
            df.withColumn("_emb_t", self.spark_norm_expr(col))
            .withColumn("_emb_cs", self.spark_codes_expr("_emb_t"))
            .withColumn("_emb_hl", self.spark_hashes_expr("_emb_cs"))
            .withColumn(out, self.spark_vector_expr("_emb_hl"))
            .drop("_emb_t", "_emb_cs", "_emb_hl")
        )

    # -- Arrow batch path (mapInArrow, numpy over the string buffer) --

    def embed_dots_df(self, df, col: str, qvs, *, keep: tuple[str, ...]):
        """``keep`` columns + exact integer self-dot ``aa`` and
        per-query dots ``ab0..ab{P-1}`` of the trigram embedding of
        ``col`` — the Arrow-vectorized twin of
        ``embed_df + aggregate(v*v) + aggregate(zip_with(v, q))``.

        Stage split (r13, guide §4.2): normalization stays a JVM
        projection (:meth:`spark_norm_expr` — the SAME expression the
        pure-Column path runs, so lower()/regexp semantics cannot
        drift), which also guarantees the cleaned text is pure ASCII
        ``[a-z0-9 ^$]`` — every byte IS its code point. The hash /
        bucket / dot stages then run once per Arrow batch in numpy
        directly over the string column's contiguous data buffer (no
        per-row Python objects): one vectorized trigram-hash pass over
        the whole buffer, one bincount for the signed bucket counts,
        one (n×dim)·(dim×P) integer matmul for the dots. All arithmetic
        is int64 and the bincount accumulates ±1.0 in float64 exactly
        (|v| ≤ trigram count « 2^53), so ``aa``/``ab`` are
        bit-identical to the interpreted HOF folds — pinned by
        tests/test_embedding.py parity tests and the semantic gate
        oracles. NULL input rows yield the ZERO vector (aa=0, ab=0),
        exactly like the HOF chain, whose ``CASE WHEN size(cs) >= 3``
        guard sends a NULL code array to the ``ELSE array()`` branch
        and the bucket aggregates then fold an empty hash list.

        Measured (sf0.1, warm noop-sunk min): semantic_text_search
        0.70 → 0.56 s and semantic_maxsim_search 0.83 → 0.68 s at 32
        cores, but 1.41 → 0.52 and 1.81 → 0.48 at 8 cores — the HOF
        folds were ~10.5 core-seconds of parallel compute (the only
        queries at sf0.1 with enough compute to scale with cores); the
        kernel cuts that to ~1.5 core-seconds, so low-core runs gain
        3.5× and the 100 TB projection scales with the same factor."""
        import numpy as np
        from pyspark.sql import types as T

        dim = self.dimension
        Q = np.asarray([[int(x) for x in q] for q in qvs], dtype=np.int64)
        assert Q.ndim == 2 and Q.shape[1] == dim
        nq = Q.shape[0]
        norm = "_emb_t"
        src = df.withColumn(norm, self.spark_norm_expr(col)).select(*keep, norm)
        in_names = [f.name for f in src.schema.fields]
        out_schema = T.StructType(
            [src.schema[k] for k in keep]
            + [T.StructField("aa", T.LongType(), True)]
            + [T.StructField(f"ab{i}", T.LongType(), True) for i in range(nq)]
        )
        t_idx = in_names.index(norm)

        def _kernel(batches):
            import numpy as np
            import pyarrow as pa

            for batch in batches:
                n = batch.num_rows
                arr = batch.column(t_idx)
                if isinstance(arr, pa.ChunkedArray):  # defensive
                    arr = arr.combine_chunks()
                if n == 0:
                    yield pa.RecordBatch.from_arrays(
                        [batch.column(i) for i in range(len(in_names) - 1)]
                        + [pa.nulls(0, pa.int64())] * (1 + nq),
                        schema=pa.schema(
                            [batch.schema.field(i) for i in range(len(in_names) - 1)]
                            + [pa.field("aa", pa.int64())]
                            + [pa.field(f"ab{i}", pa.int64()) for i in range(nq)]
                        ),
                    )
                    continue
                off_dt = (
                    np.int64
                    if pa.types.is_large_string(arr.type)
                    else np.int32
                )
                bufs = arr.buffers()  # [validity, offsets, data]
                o0 = arr.offset
                offs = np.frombuffer(bufs[1], dtype=off_dt)[o0 : o0 + n + 1]
                data = np.frombuffer(bufs[2], dtype=np.uint8)
                if bufs[0] is None:
                    valid = np.ones(n, dtype=bool)
                else:
                    bits = np.unpackbits(
                        np.frombuffer(bufs[0], dtype=np.uint8),
                        bitorder="little",
                    )
                    valid = bits[o0 : o0 + n].astype(bool)
                starts = offs[:-1].astype(np.int64)
                lens = (offs[1:] - offs[:-1]).astype(np.int64)
                lens = np.where(valid, lens, 0)
                ntri = np.maximum(lens - 2, 0)
                total = int(ntri.sum())
                if total:
                    c = data.astype(np.int64)
                    # hash of the trigram STARTING at byte p, for all p
                    h_all = (c[:-2] * 131 + c[1:-1]) * 131 + c[2:]
                    cum = np.cumsum(ntri) - ntri
                    ramp = np.arange(total, dtype=np.int64) - np.repeat(cum, ntri)
                    pos = np.repeat(starts, ntri) + ramp
                    h = h_all[pos]
                    b = h % dim
                    sign = 1.0 - 2.0 * ((h // dim) % 2)
                    rowidx = np.repeat(
                        np.arange(n, dtype=np.int64), ntri
                    )
                    v = np.bincount(
                        rowidx * dim + b, weights=sign, minlength=n * dim
                    )
                    V = v.reshape(n, dim).astype(np.int64)
                else:
                    V = np.zeros((n, dim), dtype=np.int64)
                aa = (V * V).sum(axis=1)
                AB = V @ Q.T  # (n, nq) int64
                outs = [batch.column(i) for i in range(len(in_names) - 1)]
                outs.append(pa.array(aa, type=pa.int64()))
                for i in range(nq):
                    outs.append(pa.array(AB[:, i], type=pa.int64()))
                yield pa.RecordBatch.from_arrays(
                    outs,
                    schema=pa.schema(
                        [batch.schema.field(i) for i in range(len(in_names) - 1)]
                        + [pa.field("aa", pa.int64())]
                        + [pa.field(f"ab{i}", pa.int64()) for i in range(nq)]
                    ),
                )

        return src.mapInArrow(_kernel, out_schema)

    # -- DuckDB oracle path -----------------------------------------

    def duck_expr(self, col: str) -> str:
        """DuckDB SQL fragment producing the same BIGINT[] embedding.
        DuckDB's regexp_replace needs the explicit 'g' flag (Spark's is
        global by default) and range(a,b) is b-exclusive (vs Spark's
        inclusive sequence)."""
        dim = self.dimension
        t = f"concat('^', regexp_replace(lower({col}), '[^a-z0-9 ]', '', 'g'), '$')"
        hl = (
            f"list_transform(range(1, greatest(length({t})-1, 1)), "
            f"i -> (ascii(substr({t}, CAST(i AS INT), 1))*131 "
            f"+ ascii(substr({t}, CAST(i AS INT)+1, 1)))*131 "
            f"+ ascii(substr({t}, CAST(i AS INT)+2, 1)))"
        )
        return (
            f"list_transform(range(0, {dim}), "
            f"b -> CAST(coalesce(list_sum(list_transform({hl}, "
            f"h -> CASE WHEN h % {dim} = b "
            f"THEN 1 - 2*((h // {dim}) % 2) ELSE 0 END)), 0) AS BIGINT))"
        )


# Provider surface mirroring the reference's per-model-prefix key
# headers (engine/utils/constants.hpp:4-9, embedding_service.cpp:142-180)
PROVIDER_KEY_HEADERS: dict[str, tuple[str, str]] = {
    # model prefix -> (header name, reference's missing-key error text)
    "openai/": ("X-OpenAI-API-Key", "Missing OpenAI API key."),
    "jinaai/": ("X-JinaAI-API-Key", "Missing JinaAI API key."),
    "voyageai/": ("X-VoyageAI-API-Key", "Missing VoyageAI API key."),
    "mixedbreadai/": ("X-MixedbreadAI-API-Key", "Missing mixedbread ai API key."),
    "nomicai/": ("X-NOMIC-API-Key", "Missing Nomic API key."),
    "mistralai/": ("X-MistralAI-API-Key", "Missing MistralAI API key."),
}

# Retry/backoff constants as in embedding_service.hpp:24-28
EMBED_DOCS_RETRY = 3
EMBED_QUERY_RETRY = 2
BACKOFF_INITIAL_DELAY_SEC = 1
BACKOFF_EXP_BASE = 2


def _urllib_transport(
    url: str, method: str, body: bytes | None, headers: dict[str, str]
) -> tuple[int, bytes]:
    """Default transport: stdlib urllib POST/GET → (status, body)."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # non-2xx still carries a body
        return e.code, e.read()


class HttpEmbedder:
    """Batch HTTP embedder with the reference sidecar's wire protocol
    (embedding_service.cpp:47-214):

    - ``POST {base_url}/v1/embeddings`` with ``{"model", "documents",
      "dimensions"}``; response ``{"statusCode": 200, "result": [[...]]}``
    - per-provider API-key header injected from the model-name prefix
      (``openai/…`` → ``X-OpenAI-API-Key``, …); a prefixed model with no
      key raises the reference's INVALID_PAYLOAD error before any I/O
    - retries with exponential backoff (1·2^attempt s): 3 attempts for
      document batches, 2 for queries (embedding_service.hpp:24-27)
    - ``GET {base_url}/v1/embeddings`` lists supported models

    ``transport`` is injectable (tests pass a fake; Spark workers pickle
    it with the UDF closure) and ``sleep`` likewise so backoff is
    testable without wall-clock waits.
    """

    def __init__(
        self,
        base_url: str,
        model: str,
        dimension: int,
        api_keys: dict[str, str] | None = None,
        transport=None,
        sleep=None,
        reduce_dimension: bool = False,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.dimension = dimension
        self.api_keys = dict(api_keys or {})  # header name -> key value
        self.transport = transport or _urllib_transport
        self.sleep = sleep  # resolved lazily: time.sleep is unpicklable-safe
        self.reduce_dimension = reduce_dimension

    # -- protocol ---------------------------------------------------

    def _auth_headers(self) -> dict[str, str]:
        from vectordb_spark.schema import VectorDBError

        headers = {"Content-Type": "application/json"}
        for prefix, (header, err) in PROVIDER_KEY_HEADERS.items():
            if self.model.startswith(prefix):
                if header not in self.api_keys:
                    raise VectorDBError("INVALID_PAYLOAD", err)
                headers[header] = self.api_keys[header]
        return headers

    def _post_embeddings(self, documents: list[str], retries: int) -> list[list[float]]:
        import json as _json
        import time

        from vectordb_spark.schema import VectorDBError

        headers = self._auth_headers()
        payload = _json.dumps(
            {
                "model": self.model,
                "documents": documents,
                "dimensions": self.dimension if self.reduce_dimension else 0,
            }
        ).encode("utf-8")
        sleep = self.sleep or time.sleep
        last = None
        for attempt in range(1, retries + 1):
            try:
                status, body = self.transport(
                    f"{self.base_url}/v1/embeddings", "POST", payload, headers
                )
                doc = _json.loads(body)
                if status == 200 and doc.get("statusCode") == 200:
                    out = [
                        [float(x) for x in emb] for emb in doc["result"]
                    ]
                    if len(out) != len(documents):
                        raise ValueError(
                            f"embedding count {len(out)} != batch {len(documents)}"
                        )
                    return out
                last = f"status={status} body={body[:200]!r}"
            except VectorDBError:
                raise
            except Exception as e:  # transport/parse error -> retry
                last = repr(e)
            if attempt < retries:
                sleep(BACKOFF_INITIAL_DELAY_SEC * BACKOFF_EXP_BASE**attempt)
        raise VectorDBError(
            "INFRA_UNEXPECTED_ERROR", f"Failed to embed the documents. ({last})"
        )

    # -- API --------------------------------------------------------

    def embed_batch(self, texts: Iterable[str]) -> list[list[float]]:
        return self._post_embeddings(list(texts), EMBED_DOCS_RETRY)

    def embed_query(self, query: str) -> list[float]:
        return self._post_embeddings([query], EMBED_QUERY_RETRY)[0]

    def supported_models(self) -> list[dict]:
        """GET /v1/embeddings → [{model, dim, dense, dimensionReduction}]
        (embedding_service.cpp:20-46)."""
        import json as _json

        status, body = self.transport(
            f"{self.base_url}/v1/embeddings", "GET", None, {}
        )
        doc = _json.loads(body)
        return list(doc.get("result", []))


def embed_column(embedder, col: Column | str) -> Column:
    """Arrow-batched embedding of a string column → array<float>."""
    dim = embedder.dimension

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(s: pd.Series) -> pd.Series:
        return pd.Series(embedder.embed_batch(s.fillna("").tolist()))

    return _embed(F.col(col) if isinstance(col, str) else col)
