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


class HttpEmbedder:
    """Batch HTTP embedder shaped like the reference's provider call
    (embedding_service.cpp:216-369). Not operational in this offline
    environment — constructing it is fine, calling it raises."""

    def __init__(self, base_url: str, model: str, dimension: int, api_key: str = ""):
        self.base_url = base_url
        self.model = model
        self.dimension = dimension
        self.api_key = api_key

    def embed_batch(self, texts: Iterable[str]) -> list[list[float]]:
        raise NotImplementedError(
            "HTTP embedding providers are not available in this environment; "
            "use MockEmbedder or wire a real client here."
        )


def embed_column(embedder, col: Column | str) -> Column:
    """Arrow-batched embedding of a string column → array<float>."""
    dim = embedder.dimension

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(s: pd.Series) -> pd.Series:
        return pd.Series(embedder.embed_batch(s.fillna("").tolist()))

    return _embed(F.col(col) if isinstance(col, str) else col)
