"""Client-surface parity: the reference's own binding smoke test
(engine/test/bindings/python/test.py) transcribed onto the embedded
module-level bindings, and the pyepsilla-style HTTP Client
(engine/test/concurrency/test.py shape) against a live server —
proving reference client code runs against this engine with its call
sites unchanged. Expected orderings are the reference's
(db_server.cpp:1596-1612, see FIXTURES.md)."""

from __future__ import annotations

import threading

import pytest

from vectordb_spark.server import make_server

CITIES = [
    (1, "Berlin", [0.05, 0.61, 0.76, 0.74]),
    (2, "London", [0.19, 0.81, 0.75, 0.11]),
    (3, "Moscow", [0.36, 0.55, 0.47, 0.94]),
    (4, "San Francisco", [0.18, 0.01, 0.85, 0.80]),
    (5, "Shanghai", [0.24, 0.18, 0.22, 0.44]),
]
QV = [0.35, 0.55, 0.47, 0.94]
EXPECTED = {
    "EmbeddingEuclidean": ["Moscow", "Berlin", "Shanghai", "San Francisco", "London"],
    "EmbeddingDotProduct": ["Moscow", "Berlin", "San Francisco", "London", "Shanghai"],
    "EmbeddingCosine": ["Moscow", "Shanghai", "Berlin", "San Francisco", "London"],
}
FIELDS = [
    {"name": "ID", "dataType": "INT", "primaryKey": True},
    {"name": "Doc", "dataType": "STRING"},
    {"name": "EmbeddingEuclidean", "dataType": "VECTOR_FLOAT",
     "dimensions": 4, "metricType": "EUCLIDEAN"},
    {"name": "EmbeddingDotProduct", "dataType": "VECTOR_FLOAT",
     "dimensions": 4, "metricType": "DOT_PRODUCT"},
    {"name": "EmbeddingCosine", "dataType": "VECTOR_FLOAT",
     "dimensions": 4, "metricType": "COSINE"},
]


def _records():
    return [
        {
            "ID": i,
            "Doc": doc,
            "EmbeddingEuclidean": v,
            "EmbeddingDotProduct": v,
            "EmbeddingCosine": v,
        }
        # reference test.py:59-61 appends a duplicate-PK Berlin row
        for i, doc, v in CITIES + [CITIES[0]]
    ]


def test_embedded_bindings_reference_smoke(spark, tmp_path):
    """engine/test/bindings/python/test.py, verbatim call shape."""
    import vectordb_spark.client as epsilla

    # fresh module state (other tests may have touched the globals)
    epsilla._EMBED.update({"warehouse": None, "db": None, "embedder": None})

    assert epsilla.load_db(db_name="db", db_path=str(tmp_path / "db")) == 200
    epsilla.use_db(db_name="db")
    assert epsilla.create_table(table_name="MyTable", table_fields=FIELDS) == 200
    assert epsilla.insert(table_name="MyTable", records=_records()) == 200

    for field, order in EXPECTED.items():
        code, response = epsilla.query(
            table_name="MyTable",
            query_field=field,
            response_fields=["ID", "Doc", field],
            query_vector=QV,
            filter="ID < 6",
            limit=6,
            with_distance=True,
        )
        assert code == 200
        rows = response["result"]
        # duplicate-PK row was dropped at insert: 5 unique cities, in
        # the reference's metric ordering, each with a distance column
        assert [r["Doc"] for r in rows] == order
        assert all("@distance" in r for r in rows)

    assert epsilla.delete(table_name="MyTable", primary_keys=[1, 2, 3, 4]) == 200
    code, response = epsilla.query(
        table_name="MyTable",
        query_field="EmbeddingEuclidean",
        response_fields=["ID", "Doc", "EmbeddingEuclidean"],
        query_vector=QV,
        filter="ID < 6",
        limit=10,
        with_distance=True,
    )
    assert code == 200
    assert [r["Doc"] for r in response["result"]] == ["Shanghai"]
    assert epsilla.drop_table("MyTable") == 200
    assert epsilla.unload_db("db") == 200


@pytest.fixture()
def http_client(spark, tmp_path):
    srv = make_server(spark, str(tmp_path / "wh"), port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    from vectordb_spark.client import Client

    yield Client(host="127.0.0.1", port=srv.server_address[1])
    srv.shutdown()


def test_http_client_full_flow(http_client):
    """concurrency/test.py shape: Client → load/use → CRUD → admin."""
    c = http_client
    code, resp = c.welcome()
    assert code == 200
    code, resp = c.state()
    assert code == 200

    code, resp = c.load_db(db_name="MyDB")
    assert code == 200, resp
    c.use_db("MyDB")
    code, resp = c.create_table(table_name="MyTable", table_fields=FIELDS)
    assert code == 200, resp
    code, resp = c.list_tables()
    assert resp["result"] == ["MyTable"]
    code, resp = c.describe_table("MyTable")
    assert code == 200 and resp["result"]["name"] == "MyTable"

    code, resp = c.insert(table_name="MyTable", records=_records())
    assert code == 200, resp

    code, resp = c.query(
        table_name="MyTable",
        query_field="EmbeddingCosine",
        query_vector=QV,
        response_fields=["ID", "Doc"],
        limit=3,
        with_distance=True,
    )
    assert code == 200
    assert [r["Doc"] for r in resp["result"]] == ["Moscow", "Shanghai", "Berlin"]

    code, resp = c.get(table_name="MyTable", filter="ID >= 4",
                       response_fields=["ID", "Doc"])
    assert code == 200
    assert sorted(r["ID"] for r in resp["result"]) == [4, 5]

    code, resp = c.statistics("MyTable")
    assert code == 200 and resp["result"]["totalRecords"] == 5

    code, resp = c.delete(table_name="MyTable", filter="ID <= 2")
    assert code == 200
    code, resp = c.get(table_name="MyTable", response_fields=["ID"])
    assert sorted(r["ID"] for r in resp["result"]) == [3, 4, 5]

    # error envelope: querying a missing table returns a JSON error
    code, resp = c.query(table_name="NoSuchTable", query_vector=QV,
                         query_field="EmbeddingCosine", limit=1)
    assert code != 200 and "message" in resp

    code, resp = c.drop_table("MyTable")
    assert code == 200
    code, resp = c.set_leader(True)
    assert code == 200
    code, resp = c.drop_db("MyDB")
    assert code == 200
