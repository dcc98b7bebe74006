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
