"""Client surfaces matching the reference's two public Python APIs, so
a user of the reference can point their existing code at this engine:

1. ``Client`` — the HTTP client (reference ``pyepsilla.vectordb.Client``
   as exercised by engine/test/concurrency/test.py: connect to a
   running server, ``load_db / use_db / create_table / insert / query /
   get / delete / drop_table / ...``). Every method returns the
   ``(status_code, response_json)`` tuple the reference client returns;
   requests go to the REST routes in server.py, which mirror the
   reference's web_controller.hpp surface 1:1. Standard-library urllib
   only — no dependencies.

2. The module-level EMBEDDED bindings (reference
   engine/test/bindings/python/test.py: ``import epsilla; epsilla.
   load_db(...); epsilla.use_db(...); epsilla.query(...)``) — the same
   verbs, in-process over a SparkSession instead of a linked native
   library. ``import vectordb_spark.client as epsilla`` makes the
   reference's binding smoke test run with its call sites unchanged
   (pytest transcribes it in tests/test_client.py).

Tuple/return conventions follow the reference tests' observable usage:
``(code, response) = epsilla.query(...)``, ``code = epsilla.delete(...)``.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from typing import Any


class Client:
    """HTTP client for a running vectordb_spark server (server.py).

    Reference surface: pyepsilla vectordb.Client(protocol, host, port)
    — one live database per client, selected with use_db/load_db.
    """

    def __init__(
        self,
        protocol: str = "http",
        host: str = "localhost",
        port: int | str = 8888,
        headers: dict[str, str] | None = None,
    ):
        self._base = f"{protocol}://{host}:{port}"
        self._headers = {"Content-Type": "application/json", **(headers or {})}
        self._db: str | None = None

    # ------------------------------------------------------- plumbing
    def _request(
        self, method: str, path: str, payload: dict | None = None
    ) -> tuple[int, dict]:
        data = None if payload is None else json.dumps(payload).encode()
        req = urllib.request.Request(
            self._base + path, data=data, method=method, headers=self._headers
        )
        try:
            with urllib.request.urlopen(req) as r:
                body = r.read()
                status = r.status
        except urllib.error.HTTPError as e:  # error envelopes are JSON too
            body = e.read()
            status = e.code
        try:
            return status, json.loads(body)
        except (json.JSONDecodeError, UnicodeDecodeError):
            # GET / is text/plain (the reference's welcome banner)
            return status, {"message": body.decode(errors="replace")}

    def _db_or_raise(self) -> str:
        if self._db is None:
            raise RuntimeError("No database in use; call use_db/load_db first.")
        return self._db

    # ---------------------------------------------------------- admin
    def welcome(self) -> tuple[int, dict]:
        return self._request("GET", "/")

    def state(self) -> tuple[int, dict]:
        return self._request("GET", "/state")

    def load_db(
        self,
        db_name: str,
        db_path: str | None = None,
        vector_scale: int | None = None,
        wal_enabled: bool | None = None,
    ) -> tuple[int, dict]:
        payload: dict[str, Any] = {"name": db_name}
        if db_path is not None:
            payload["path"] = db_path
        if vector_scale is not None:
            payload["vectorScale"] = vector_scale
        if wal_enabled is not None:
            payload["walEnabled"] = wal_enabled
        code, resp = self._request("POST", "/api/load", payload)
        if code == 200 and self._db is None:
            self._db = db_name
        return code, resp

    def use_db(self, db_name: str) -> None:
        self._db = db_name

    def unload_db(self, db_name: str) -> tuple[int, dict]:
        if self._db == db_name:
            self._db = None
        return self._request("POST", f"/api/{db_name}/unload")

    def drop_db(self, db_name: str) -> tuple[int, dict]:
        if self._db == db_name:
            self._db = None
        return self._request("DELETE", f"/api/{db_name}/drop")

    def release_db(self, db_name: str) -> tuple[int, dict]:
        return self._request("POST", f"/api/{db_name}/release")

    def dump_db(self, db_name: str, path: str) -> tuple[int, dict]:
        return self._request("POST", "/api/dump", {"name": db_name, "path": path})

    def set_leader(self, leader: bool) -> tuple[int, dict]:
        return self._request("POST", "/api/setleader", {"leader": leader})

    def update_config(self, **config) -> tuple[int, dict]:
        return self._request("POST", "/api/config", config)

    # --------------------------------------------------------- schema
    def create_table(
        self,
        table_name: str = "MyTable",
        table_fields: list[dict] | None = None,
        indices: list[dict] | None = None,
    ) -> tuple[int, dict]:
        payload: dict[str, Any] = {
            "name": table_name,
            "fields": table_fields or [],
        }
        if indices is not None:
            payload["indices"] = indices
        return self._request(
            "POST", f"/api/{self._db_or_raise()}/schema/tables", payload
        )

    def list_tables(self) -> tuple[int, dict]:
        return self._request(
            "GET", f"/api/{self._db_or_raise()}/schema/tables/show"
        )

    def describe_table(self, table_name: str) -> tuple[int, dict]:
        return self._request(
            "GET",
            f"/api/{self._db_or_raise()}/schema/tables/{table_name}/describe",
        )

    def drop_table(self, table_name: str = "MyTable") -> tuple[int, dict]:
        return self._request(
            "DELETE",
            f"/api/{self._db_or_raise()}/schema/tables/{table_name}",
        )

    # ----------------------------------------------------------- data
    def insert(
        self,
        table_name: str = "MyTable",
        records: list[dict] | None = None,
        upsert: bool = False,
    ) -> tuple[int, dict]:
        return self._request(
            "POST",
            f"/api/{self._db_or_raise()}/data/insert",
            {"table": table_name, "data": records or [], "upsert": upsert},
        )

    def upsert(
        self, table_name: str = "MyTable", records: list[dict] | None = None
    ) -> tuple[int, dict]:
        return self.insert(table_name, records, upsert=True)

    def load_csv(
        self,
        table_name: str,
        file_path: str,
        header: bool = True,
        upsert: bool = False,
    ) -> tuple[int, dict]:
        return self._request(
            "POST",
            f"/api/{self._db_or_raise()}/data/load",
            {
                "table": table_name,
                "path": file_path,
                "header": header,
                "upsert": upsert,
            },
        )

    def delete(
        self,
        table_name: str = "MyTable",
        primary_keys: list | None = None,
        filter: str = "",
    ) -> tuple[int, dict]:
        payload: dict[str, Any] = {"table": table_name}
        if primary_keys is not None:
            payload["primaryKeys"] = primary_keys
        if filter:
            payload["filter"] = filter
        return self._request(
            "POST", f"/api/{self._db_or_raise()}/data/delete", payload
        )

    def query(
        self,
        table_name: str = "MyTable",
        query_text: str = "",
        query_field: str = "",
        query_index: str = "",
        query_vector: list | dict | None = None,
        response_fields: list[str] | None = None,
        limit: int = 2,
        filter: str = "",
        with_distance: bool = False,
        facets: list[dict] | None = None,
    ) -> tuple[int, dict]:
        payload: dict[str, Any] = {"table": table_name, "limit": limit}
        if query_text:
            payload["query"] = query_text
        if query_field:
            payload["queryField"] = query_field
        if query_index:
            payload["queryIndex"] = query_index
        if query_vector is not None:
            payload["queryVector"] = query_vector
        if response_fields is not None:
            payload["response"] = response_fields
        if filter:
            payload["filter"] = filter
        if with_distance:
            payload["withDistance"] = True
        if facets is not None:
            payload["facets"] = facets
        return self._request(
            "POST", f"/api/{self._db_or_raise()}/data/query", payload
        )

    def get(
        self,
        table_name: str = "MyTable",
        response_fields: list[str] | None = None,
        filter: str = "",
        skip: int | None = None,
        limit: int | None = None,
        primary_keys: list | None = None,
        facets: list[dict] | None = None,
    ) -> tuple[int, dict]:
        payload: dict[str, Any] = {"table": table_name}
        if response_fields is not None:
            payload["response"] = response_fields
        if filter:
            payload["filter"] = filter
        if skip is not None:
            payload["skip"] = skip
        if limit is not None:
            payload["limit"] = limit
        if primary_keys is not None:
            payload["primaryKeys"] = primary_keys
        if facets is not None:
            payload["facets"] = facets
        return self._request(
            "POST", f"/api/{self._db_or_raise()}/data/get", payload
        )

    def statistics(self, table_name: str) -> tuple[int, dict]:
        q = urllib.parse.urlencode({"table": table_name})
        return self._request(
            "GET", f"/api/{self._db_or_raise()}/statistics?{q}"
        )

    def rebuild(self, table_name: str, field: str, k: int = 16) -> tuple[int, dict]:
        return self._request(
            "POST",
            "/api/rebuild",
            {
                "db": self._db_or_raise(),
                "table": table_name,
                "field": field,
                "k": k,
            },
        )


# ======================================================================
# Embedded module-level bindings (reference test.py call shape:
# ``import vectordb_spark.client as epsilla``). One process-global
# warehouse + current-db pointer, lazily rooted at the first load_db's
# db_path (sibling dbs land next to it, as the reference's per-path
# load does).
# ======================================================================

_EMBED: dict[str, Any] = {"warehouse": None, "db": None, "embedder": None}


def _warehouse(db_path: str | None = None):
    if _EMBED["warehouse"] is None:
        import os
        import tempfile

        from vectordb_spark import get_spark
        from vectordb_spark.catalog import Warehouse

        root = (
            os.path.dirname(os.path.abspath(db_path))
            if db_path
            else tempfile.mkdtemp(prefix="vdb_embedded_")
        )
        _EMBED["warehouse"] = Warehouse(get_spark("vectordb-embedded"), root)
    return _EMBED["warehouse"]


def set_embedder(embedder) -> None:
    """Optional: attach an embedder for auto-embedding index fields."""
    _EMBED["embedder"] = embedder


def load_db(db_name: str, db_path: str | None = None, **kw) -> int:
    _warehouse(db_path).load_db(db_name, db_path)
    if _EMBED["db"] is None:
        _EMBED["db"] = db_name
    return 200


def use_db(db_name: str) -> int:
    _EMBED["db"] = db_name
    return 200


def unload_db(db_name: str) -> int:
    wh = _warehouse()
    try:
        wh.unload_db(db_name)
    except Exception:
        return 500
    if _EMBED["db"] == db_name:
        _EMBED["db"] = None
    return 200


def _db():
    if _EMBED["db"] is None:
        raise RuntimeError("No database in use; call load_db/use_db first.")
    return _warehouse().database(_EMBED["db"])


def create_table(
    table_name: str = "MyTable", table_fields: list[dict] | None = None, **kw
) -> int:
    _db().create_table(
        {"name": table_name, "fields": table_fields or [], **kw},
        embedder=_EMBED["embedder"],
    )
    return 200


def insert(
    table_name: str = "MyTable", records: list[dict] | None = None
) -> int:
    _db().table(table_name, embedder=_EMBED["embedder"]).insert(records or [])
    return 200


def query(
    table_name: str = "MyTable",
    query_field: str = "",
    query_vector: list | dict | None = None,
    response_fields: list[str] | None = None,
    limit: int = 2,
    filter: str = "",
    with_distance: bool = False,
    **kw,
) -> tuple[int, dict]:
    from vectordb_spark.server import _result_envelope

    facets = kw.get("facets")
    out = _db().table(table_name, embedder=_EMBED["embedder"]).query(
        query_vector=query_vector,
        query_field=query_field or None,
        limit=limit,
        response=response_fields,
        filter=filter,
        with_distance=with_distance,
        query_text=kw.get("query_text"),
        facets=facets,
    )
    return 200, {
        "statusCode": 200,
        "message": "Query search successfully.",
        "result": _result_envelope(out, response_fields, facets),
    }


def get(
    table_name: str = "MyTable",
    response_fields: list[str] | None = None,
    filter: str = "",
    skip: int = 0,
    limit: int | None = None,
    primary_keys: list | None = None,
) -> tuple[int, dict]:
    from vectordb_spark.server import _result_envelope

    out = _db().table(table_name, embedder=_EMBED["embedder"]).get(
        response=response_fields,
        filter=filter,
        skip=skip,
        limit=limit if limit is not None else 2**30,
        primary_keys=primary_keys,
    )
    return 200, {
        "statusCode": 200,
        "message": "Query get successfully.",
        "result": _result_envelope(out, response_fields, None),
    }


def delete(
    table_name: str = "MyTable",
    primary_keys: list | None = None,
    filter: str = "",
) -> int:
    _db().table(table_name, embedder=_EMBED["embedder"]).delete(
        primary_keys, filter
    )
    return 200


def drop_table(table_name: str = "MyTable") -> int:
    _db().drop_table(table_name)
    return 200
