"""Source readers: CSV (real, unlike the reference's stub S10) and
JSON, feeding the engine's bulk-ingest path."""

from __future__ import annotations

from pyspark.sql import types as T

from vectordb_spark.catalog import Warehouse
from vectordb_spark.sources.readers import read_csv, read_json


def test_csv_roundtrip_to_table(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "ID,Doc,x,y\n"
        + "\n".join(f"{i},doc{i},{i * 0.5},{i * 0.25}" for i in range(10))
        + "\n"
    )
    schema = T.StructType(
        [
            T.StructField("ID", T.IntegerType()),
            T.StructField("Doc", T.StringType()),
            T.StructField("x", T.FloatType()),
            T.StructField("y", T.FloatType()),
        ]
    )
    df = read_csv(spark, str(p), schema=schema)
    assert df.count() == 10

    # CSV → engine table bulk ingest (the reference's S10 endpoint is a
    # stub that loads nothing; here it is real)
    from pyspark.sql import functions as F

    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = wh.load_db("csvdb").create_table(
        {
            "name": "t",
            "fields": [
                {"name": "ID", "dataType": "INT", "primaryKey": True},
                {"name": "Doc", "dataType": "STRING"},
                {
                    "name": "Embedding",
                    "dataType": "VECTOR_FLOAT",
                    "dimensions": 2,
                    "metricType": "EUCLIDEAN",
                },
            ],
        }
    )
    staged = df.select("ID", "Doc", F.array("x", "y").alias("Embedding"))
    res = t.insert_df(staged)
    assert res["inserted"] == 10
    assert t.statistics() == {"totalRecords": 10}


def test_json_reader(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    df = read_json(spark, str(p))
    assert sorted(r.a for r in df.collect()) == [1, 2]
