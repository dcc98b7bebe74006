"""Multimodal gate query: the binary-media path stops being
pytest-only. Deterministic PGM images are synthesized from doc_id
through the REAL encoder (operators/multimodal.py `_encode_image`),
decoded and histogram-featurized through the REAL Arrow-batched
decoder (`extract_image_features`), and the resulting 16-bin feature
vectors are checked against a CLOSED-FORM oracle: pixel(i) =
(doc_id·31 + i·7) mod 256 makes every histogram count a pure
arithmetic consequence of doc_id, so DuckDB can compute the expected
features without ever touching a byte of image data. A hash match
proves the encode → parse → decode → histogram loop is byte-exact,
not just shape-correct.

Float exactness: counts are ≤ 128 and the normalizer is 128 = 2^7, so
every feature value c/128 is an exact binary fraction — identical in
float32 (Spark side) and float64 (oracle side), no rounding anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling modules)

from vectordb_spark.queries import query
from vectordb_spark.sources.readers import load_table

_W, _H = 16, 8
_NPX = _W * _H  # 128 = 2^7 → exact float normalization
_BINS = 16

_FEATURE_LIST = ", ".join(
    f"CAST(SUM(CASE WHEN bin = {b} THEN 1 ELSE 0 END) / {_NPX}.0 AS FLOAT4)"
    for b in range(_BINS)
)

_MEDIA_ORACLE = f"""
WITH px AS (
    SELECT d.doc_id AS media_id,
           ((d.doc_id * 31 + i.i * 7) % 256) // {256 // _BINS} AS bin
    FROM documents d, (SELECT UNNEST(range(0, {_NPX})) AS i) i
)
SELECT media_id, 'image' AS kind, [{_FEATURE_LIST}] AS features
FROM px
GROUP BY media_id
"""


@query("media_pgm_histogram_features", oracle=_MEDIA_ORACLE)
def media_pgm_histogram_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → synthesized {_W}×{_H} PGM binaries (real netpbm
    encoder) → real Arrow-batched decode + 16-bin grayscale histogram
    features. Both media synthesis and feature extraction run as
    ``mapInPandas`` (the multimodal data plane: Python only at the
    codec boundary, one Arrow batch in / one out, no per-row Python),
    so this is the exact plumbing a 100 TB image pipeline uses — the
    oracle never sees bytes, only the closed-form arithmetic the
    pixels were generated from."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    import vectordb_spark.operators.multimodal as MM

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    gen_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def _gen(batches):
        idx = np.arange(_NPX)
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                px = ((int(did) * 31 + idx * 7) % 256).astype(np.uint8)
                rows.append(MM._encode_image(px.reshape(_H, _W), "PGM"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["image"] * len(pdf),
                    "content": rows,
                }
            )

    media = d.mapInPandas(_gen, gen_schema)
    return MM.extract_image_features(media, bins=_BINS)
