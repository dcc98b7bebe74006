"""Parquet-backed table with the reference engine's full DML/query
surface (SURVEY.md §2.1, §3).

Storage model: a manifest (``_meta.json``) lists immutable parquet data
dirs plus ``next_row_id``; inserts append a new data dir, deletes and
upserts write a consolidated base — the object-store pattern (what
Delta/Iceberg do with a transaction log; the reference's WAL+snapshot,
table_segment_mvp.cpp:939-1010, collapses into this). Manifest writes
are atomic tmp+rename. Writes are single-writer per table, like the
reference's ``data_update_mutex_`` (table_segment_mvp.cpp:456); readers
always see a complete manifest → snapshot isolation, strictly better
than the reference's racy lock-free reads (SURVEY.md §3.3).

Every row carries ``_row_id`` — the insertion-order cursor (reference
table_segment_mvp.cpp:487) — which drives pagination order, KNN
tie-breaking, and upsert "latest wins".

Deterministic ingest transforms replicated from the reference:
- COSINE fields L2-normalized at ingest, dense (:574-587) and sparse
  (:556-562); query vectors normalized at search (table_mvp.cpp:334-349)
- sparse validation skips bad rows, response counts skipped (:511-553)
- GEO_POINT lat clamped to [-90,90], lon to [-180,180] (:626-640)
- duplicate-PK insert skips (first wins), upsert replaces (last wins)
  in batch-array order (:652-795)
"""

from __future__ import annotations

import functools
import json
import math
import os
import tempfile
import threading
import time
from contextlib import contextmanager
from typing import Any

try:  # POSIX advisory file locks (Linux/macOS); absent on Windows
    import fcntl
except ImportError:  # pragma: no cover
    fcntl = None  # type: ignore[assignment]

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from vectordb_spark.embedding import embed_column
from vectordb_spark.expr.compile import (
    references_distance,
    to_spark_column,
)
from vectordb_spark.expr.parser import parse_filter
from vectordb_spark.operators.pq import (
    RESIDUAL_CONVENTION as _PQ_RESIDUAL_CONVENTION,
)
from vectordb_spark.functions.distance import (
    distance_for_metric,
    l2_normalize,
    sparse_distance_for_metric,
    sparse_l2_normalize,
)
from vectordb_spark.schema import (
    FieldSchema,
    FieldType,
    TableSchema,
    VectorDBError,
    validate_schema,
)

DEFAULT_CAPACITY = 2**31 - 1
DEFAULT_GET_LIMIT = 2**30  # reference web_controller.hpp:904-911


# Re-entrancy registry for writer_lock: thread-local SET OF TABLE PATHS
# currently held by this thread. Module-level (not per-Table) because
# nested mutations routinely run through DIFFERENT Table instances on
# the same path (db.table(name) hands out a fresh handle every call) —
# a per-instance flag would let the inner call re-flock the same file
# from a new fd and self-deadlock.
_WRITER_HELD = threading.local()


def _writer_locked(fn):
    """Serialize a manifest read-modify-write across THREADS AND
    PROCESSES: the whole mutation (meta load → segment write → manifest
    commit) runs under an exclusive flock on ``<table>/_writer.lock``.

    The reference is single-process, so its ``data_update_mutex_``
    (table_segment_mvp.cpp:456) suffices; at 100 TB multiple jobs write
    one table, and an in-process ``threading.Lock`` (server.py) cannot
    exclude a second process — two interleaved load→save cycles would
    silently drop the first commit. flock conflicts between distinct
    file descriptors even within one process, so two Table objects on
    the same path serialize too; the thread-local held-paths registry
    lets nested calls through any handle of the same table without
    self-deadlock.
    """

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        with self.writer_lock():
            return fn(self, *args, **kwargs)

    return wrapper


class Table:
    # search_text_df limits at or below this use the two-phase
    # collect-then-pushed-IN fetch; above it, one composed plan
    _TEXT_FETCH_COLLECT_MAX = 1024

    def __init__(
        self,
        spark: SparkSession,
        schema: TableSchema,
        path: str,
        *,
        embedder=None,
        index_sources: dict[str, str] | None = None,
        capacity_override: int | None = None,
        partition_by: str | None = None,
    ):
        validate_schema(schema)
        self.spark = spark
        self.schema = schema
        self.path = path
        # Reference parity (db_mvp.cpp:24,38): the database's
        # init_table_scale applies to every table on EVERY load, so
        # "unload and reload with a larger vectorScale" actually raises
        # the limit. Overrides the capacity persisted at creation.
        self.capacity_override = capacity_override
        self.embedder = embedder
        self._meta_path = os.path.join(path, "_meta.json")
        # index field name -> source STRING field (auto-embedding, §1.4)
        self.index_sources = index_sources or self._load_index_sources()
        # storage partition column (hive-style segment layout): scans
        # filtered on it prune whole directories — the 100 TB
        # data-skipping lever. Persisted at create; on reopen the
        # manifest wins OUTRIGHT — a manifest without the key means
        # "unpartitioned", not a fall-through to the constructor
        # argument (which would silently mix partitioned and flat
        # segments in one table).
        if self._table_exists():
            self.partition_by = self._load_partition_by()
        else:
            self.partition_by = partition_by

    # ---------------------------------------------------------------- meta

    def _table_exists(self) -> bool:
        """A table exists if ANY manifest is present. The versioned
        commit tokens (_meta.s{N}.json) are authoritative — a writer
        crashing between link(2) and the _meta.json replace on the
        FIRST commit leaves only _meta.s1.json, and keying existence on
        _meta.json alone would make reopen treat the table as new
        (constructor partition_by would override the committed one, and
        _init_storage would raise CONCURRENT_WRITE instead of rolling
        forward)."""
        return bool(self._seq_manifests()) or os.path.exists(self._meta_path)

    def _init_storage(self, capacity: int | None = None) -> None:
        os.makedirs(self.path, exist_ok=True)
        if not self._table_exists():
            self._save_meta(
                {
                    "version": 0,
                    "files": [],
                    "next_row_id": 0,
                    "row_count": 0,
                    "capacity": int(capacity) if capacity else DEFAULT_CAPACITY,
                    "index_sources": self.index_sources,
                    "partition_by": self.partition_by,
                }
            )

    def _load_meta(self) -> dict:
        # Roll-forward read: the versioned commit files (_meta.s{N}.json,
        # the atomic CAS tokens — see _save_meta) are authoritative; the
        # _meta.json pointer is best-effort (a writer crashing between
        # link and replace leaves it one commit behind). Retry covers a
        # concurrent GC unlinking an old token between list and open.
        for _ in range(3):
            seqs = self._seq_manifests()
            if not seqs:
                break
            try:
                with open(self._seq_path(seqs[-1])) as f:
                    return json.load(f)
            except FileNotFoundError:
                continue
        with open(self._meta_path) as f:
            return json.load(f)

    def _seq_path(self, seq: int) -> str:
        return os.path.join(self.path, f"_meta.s{int(seq)}.json")

    def _seq_manifests(self) -> list[int]:
        try:
            names = os.listdir(self.path)
        except FileNotFoundError:
            return []
        return sorted(
            int(n[7:-5])
            for n in names
            if n.startswith("_meta.s") and n.endswith(".json") and n[7:-5].isdigit()
        )

    @contextmanager
    def writer_lock(self):
        """Exclusive cross-process writer lock for this table (see
        _writer_locked). Re-entrant per thread across ANY handle of the
        same table path; a no-op where fcntl is unavailable."""
        key = os.path.realpath(self.path)
        held: set = getattr(_WRITER_HELD, "paths", None) or set()
        if fcntl is None or key in held:
            yield
            return
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, "_writer.lock"), "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            _WRITER_HELD.paths = held | {key}
            try:
                yield
            finally:
                _WRITER_HELD.paths = _WRITER_HELD.paths - {key}
                fcntl.flock(lf, fcntl.LOCK_UN)

    def _capacity(self, meta: dict) -> int:
        if self.capacity_override:
            return int(self.capacity_override)
        return int(meta.get("capacity") or DEFAULT_CAPACITY)

    def _load_index_sources(self) -> dict[str, str]:
        if self._table_exists():
            return self._load_meta().get("index_sources", {})
        return {}

    def _load_partition_by(self) -> str | None:
        if self._table_exists():
            return self._load_meta().get("partition_by")
        return None

    def _write_segment(self, df: DataFrame, name: str) -> None:
        if self.partition_by == "_cluster" and "_cluster" not in df.columns:
            # clustered layout (compact(cluster_by=...)): appended
            # segments self-assign from the persisted centroids
            df = self._assign_cluster(df)
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(self.partition_by)
        writer.parquet(os.path.join(self.path, name))

    def _save_meta(self, meta: dict) -> None:
        """Manifest commit as a TRUE compare-and-swap. The flock writer
        lock serializes writers on one host, but flock is
        advisory-LOCAL — two Spark drivers on different HOSTS against
        shared POSIX storage each hold their own lock, and a plain
        read-modify-replace would silently clobber the other's
        committed segments. Every commit therefore claims the next
        commit sequence number by hard-linking the fully-written
        manifest to ``_meta.s{seq}.json``: link(2) is atomic-exclusive,
        so exactly ONE writer ever owns a given seq — a writer holding
        a stale manifest (stale seq) or racing for the same seq loses
        with a clean CONCURRENT_WRITE instead of a lost update, and
        retries from a fresh load. ``seq`` is orthogonal to the data
        ``version`` (vacuum and index rebuild commit without bumping
        the version; every save bumps seq). The ``_meta.json`` pointer
        is kept for inspection/back-compat; _load_meta treats the
        newest seq token as authoritative (crash between link and
        replace loses nothing)."""
        os.makedirs(self.path, exist_ok=True)
        base_seq = int(meta.get("seq") or 0)
        # Resurrection guard (the Delta-Lake retention invariant). The
        # link-CAS below is only sound while the claimed token name
        # s{base_seq+1} cannot have EXISTED AND BEEN GC'd — a stale
        # writer linking into such a hole "wins" a commit the chain
        # never sees (observed: a 10 ms-stale writer after five racing
        # commits + count-only GC → wins = version + 1, a silent lost
        # update). Two pieces close it:
        #   1. Here: refuse when the chain has visibly advanced. GC
        #      always retains the RETENTION newest tokens, and a tip
        #      token is only deleted once newer ones exist, so
        #      max(existing tokens) IS the true tip — this check is
        #      exact, not heuristic.
        #   2. _gc_seq_manifests: never delete a token younger than
        #      SEQ_TOKEN_MIN_AGE_S. The only window this check leaves
        #      open is check→link (microseconds); a hole needs a
        #      younger-than-tip token to age 60 s first, so within the
        #      window the link can only LOSE cleanly, never resurrect.
        # Long-held manifests (a multi-minute segment write at scale)
        # stay safe: if anything committed meanwhile, its token is
        # still visible here and the writer gets a clean retry signal.
        newest = self._seq_manifests()
        if newest and newest[-1] > base_seq:
            raise VectorDBError(
                "CONCURRENT_WRITE",
                f"Commit {base_seq + 1} is stale: the manifest chain is "
                f"already at {newest[-1]}; reload the table and retry.",
            )
        # Bump seq in the SERIALIZED copy only; the caller's dict
        # advances after the link succeeds. If the caller's dict were
        # bumped first, a CONCURRENT_WRITE loser that retried with the
        # same stale dict (instead of reloading) would eventually claim
        # a later seq and clobber the winning commit — the exact lost
        # update the CAS exists to prevent.
        committed = dict(meta)
        committed["seq"] = base_seq + 1
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(committed, f)
            try:
                os.link(tmp, self._seq_path(base_seq + 1))
            except FileExistsError:
                raise VectorDBError(
                    "CONCURRENT_WRITE",
                    f"Commit {base_seq + 1} was claimed by another writer "
                    "(different host?) after this one loaded the manifest; "
                    "reload the table and retry.",
                ) from None
            meta["seq"] = base_seq + 1
            os.replace(tmp, self._meta_path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        self._gc_seq_manifests()

    # retained seq tokens: enough that a reader between list and open
    # never sees its chosen (max) token GC'd by the next few commits
    SEQ_MANIFEST_RETENTION = 4
    # tokens younger than this (fs mtime) are NEVER GC'd regardless of
    # count — the other half of the staleness contract in _save_meta:
    # deleting a recent token re-opens its name for os.link, turning a
    # stale writer's claim into a phantom commit the chain never sees.
    SEQ_TOKEN_MIN_AGE_S = 60.0

    def _gc_seq_manifests(self) -> None:
        cutoff = time.time() - self.SEQ_TOKEN_MIN_AGE_S
        for s in self._seq_manifests()[: -self.SEQ_MANIFEST_RETENTION]:
            p = self._seq_path(s)
            try:
                if os.path.getmtime(p) <= cutoff:
                    os.unlink(p)
            except FileNotFoundError:
                pass

    # ---------------------------------------------------------------- read

    def df(self, version: int | None = None) -> DataFrame:
        """Snapshot incl. ``_row_id``. ``version=None`` reads the
        current manifest; an integer time-travels to that committed
        version (data dirs are immutable, so every recorded manifest
        stays readable — the table-format time-travel property)."""
        meta = self._load_meta()
        if version is None:
            files = meta["files"]
        else:
            if version == meta["version"]:
                files = meta["files"]
            else:
                hist = {h["version"]: h["files"] for h in meta.get("history", [])}
                if version not in hist:
                    raise VectorDBError(
                        "VERSION_NOT_FOUND",
                        f"Version {version} not in table history.",
                    )
                files = hist[version]
        return self._df_for_files(files)

    def _df_for_files(self, files: list[str]) -> DataFrame:
        paths = [os.path.join(self.path, p) for p in files]
        if not paths:
            return self.spark.createDataFrame(
                [], self.schema.to_spark_schema(with_row_id=True)
            )
        if self.partition_by and len(paths) > 1:
            # each segment dir is its own hive-partitioned root; a
            # multi-path read would try to treat them as partition
            # siblings of one table. Per-segment reads unioned by name
            # keep the per-segment PartitionFilters pruning intact.
            from functools import reduce

            dfs = [
                self._restore_partition_type(self._read_segments(q))
                for q in paths
            ]
            return reduce(lambda a, b: a.unionByName(b), dfs)
        return self._restore_partition_type(self._read_segments(*paths))

    def scan_df(
        self,
        filter: str = "",
        *,
        extra_bounds: dict[str, tuple[float | None, float | None]] | None = None,
    ) -> DataFrame:
        """Distributed filtered snapshot with MANIFEST-LEVEL segment
        skipping — the documented bulk-consumer scan route. The
        filter's conjunctive range constraints on integer fields
        (expr/prune.py range_bounds) are checked against the
        per-segment min/max recorded at write time; segments that
        provably can't match never enter the Spark plan — at 100 TB
        this prunes before file listing, one layer above parquet
        row-group stats. Anything not range-extractable (OR, LIKE,
        arithmetic) just skips pruning; the full predicate is always
        applied to the surviving rows, so results never depend on the
        stats. ``extra_bounds`` lets callers tighten further (the PK
        point-lookup route passes the PK list's min/max)."""
        meta = self._load_meta()
        ast = parse_filter(filter, self.field_map())
        files = list(meta["files"])
        stats = meta.get("segment_stats") or {}
        from vectordb_spark.expr.prune import range_bounds, segment_overlaps

        bounds = range_bounds(ast)
        from vectordb_spark.expr.prune import _same_kind

        for col, (lo, hi) in (extra_bounds or {}).items():
            cur_lo, cur_hi = bounds.get(col, (None, None))
            if lo is not None and (
                cur_lo is None
                or (_same_kind(lo, cur_lo) and lo > cur_lo)
            ):
                cur_lo = lo
            if hi is not None and (
                cur_hi is None
                or (_same_kind(hi, cur_hi) and hi < cur_hi)
            ):
                cur_hi = hi
            bounds[col] = (cur_lo, cur_hi)
        if bounds and stats:
            files = [f for f in files if segment_overlaps(stats.get(f), bounds)]
        df = self._df_for_files(files)
        if ast is not None:
            df = df.where(to_spark_column(ast))
        return df

    def _read_segments(self, *paths: str) -> DataFrame:
        """Segment read with partition-type-inference protection. When
        the partition column is a DECLARED field, read with the
        declared schema: Spark then parses the partition directory
        value directly as that type, so a STRING key '001' round-trips
        intact. (The cast-back in _restore_partition_type cannot undo
        lossy inference — '001' inferred as int 1 reads back as '1'.)
        Internal partition keys (_cluster) keep inference: they are
        engine-written ints, never lossy."""
        reader = self.spark.read
        if self.partition_by:
            declared = self.schema.to_spark_schema(with_row_id=True)
            if self.partition_by in {f.name for f in declared.fields}:
                reader = reader.schema(declared)
        return reader.parquet(*paths)

    def _restore_partition_type(self, df: DataFrame) -> DataFrame:
        """Belt-and-braces for segments read WITHOUT an explicit schema
        (internal _cluster partitioning): cast the partition column
        back to its declared type so the read schema never drifts from
        the table schema. (The primary defense is _read_segments'
        explicit-schema read.)"""
        if not self.partition_by:
            return df
        declared = self.schema.to_spark_schema(with_row_id=True)
        if self.partition_by not in df.columns or self.partition_by not in {
            f.name for f in declared.fields
        }:
            return df
        target = declared[self.partition_by].dataType
        if df.schema[self.partition_by].dataType == target:
            return df
        return df.withColumn(
            self.partition_by, F.col(self.partition_by).cast(target)
        )

    def versions(self) -> list[int]:
        meta = self._load_meta()
        hist = [h["version"] for h in meta.get("history", [])]
        return sorted({*hist, meta["version"]})

    def changes(
        self,
        v_from: int,
        v_to: int | None = None,
        *,
        update_preimages: bool = False,
    ) -> DataFrame:
        """Row-level changefeed between two committed versions — the
        Delta-CDF shape on this table format's manifest history, built
        for incremental downstream pipelines (re-dedup only the new
        tail, re-index only changed rows) instead of full-snapshot
        reprocessing at every hop.

        Returns the table's declared columns plus ``_change_type`` ∈
        {insert, delete, update}: post-image rows for insert/update,
        pre-image rows for delete; unchanged rows never appear. With
        ``update_preimages=True`` the feed is Delta-CDF-complete:
        updates emit an ``update_pre`` row (old image) and an
        ``update_post`` row — what a subtractive incremental consumer
        (operators/matview.py) needs to retract old contributions.

        Scale shape — file-level pruning first: segment dirs are
        immutable, so any dir listed in BOTH manifests cannot contain
        a change and is never scanned. An append-mostly history diffs
        by scanning only the appended tail. Dirs only in one manifest
        (deletes, upsert rewrites, compaction) fall through to a
        row-level full-outer join on the primary key, where content
        equality (a null-safe struct compare over the declared
        columns, deliberately excluding the storage-internal _row_id
        that compaction reassigns) drops rewritten-but-identical rows
        — so a pure ``compact()`` boundary yields an EMPTY changefeed
        at the cost of scanning the rewritten dirs, the honest
        minimum. The join shuffles only the differing dirs' rows,
        never the whole table."""
        meta = self._load_meta()
        files = {h["version"]: h["files"] for h in meta.get("history", [])}
        files[meta["version"]] = meta["files"]
        if v_to is None:
            v_to = meta["version"]
        for v in (v_from, v_to):
            if v not in files:
                raise VectorDBError(
                    "VERSION_NOT_FOUND", f"Version {v} not in table history."
                )
        pk_field = self.schema.primary_key
        if pk_field is None:
            raise VectorDBError(
                "NO_PRIMARY_KEY", "changes() requires a primary-key field."
            )
        pk = pk_field.name
        cols = [f.name for f in self.schema.fields]
        old_set, new_set = set(files[v_from]), set(files[v_to])

        def _read(paths: set[str]) -> DataFrame:
            if not paths:
                return self.spark.createDataFrame(
                    [], self.schema.to_spark_schema(with_row_id=True)
                ).select(*cols)
            full = [os.path.join(self.path, p) for p in sorted(paths)]
            if self.partition_by and len(full) > 1:
                from functools import reduce

                return reduce(
                    lambda a, b: a.unionByName(b),
                    (
                        self._restore_partition_type(self._read_segments(q))
                        for q in full
                    ),
                ).select(*cols)
            return self._restore_partition_type(
                self._read_segments(*full)
            ).select(*cols)

        old = _read(old_set - new_set).alias("o")
        new = _read(new_set - old_set).alias("n")
        j = old.join(new, F.col(f"o.{pk}") == F.col(f"n.{pk}"), "full_outer")
        o_struct = F.struct(*[F.col(f"o.{c}") for c in cols])
        n_struct = F.struct(*[F.col(f"n.{c}") for c in cols])
        change = (
            F.when(F.col(f"o.{pk}").isNull(), F.lit("insert"))
            .when(F.col(f"n.{pk}").isNull(), F.lit("delete"))
            .when(o_struct.eqNullSafe(n_struct), F.lit(None))
            .otherwise(F.lit("update"))
        )
        j = j.withColumn("_change_type", change).where(
            F.col("_change_type").isNotNull()
        )
        out = [
            F.when(F.col("_change_type") == "delete", F.col(f"o.{c}"))
            .otherwise(F.col(f"n.{c}"))
            .alias(c)
            for c in cols
        ]
        if not update_preimages:
            return j.select(*out, "_change_type")
        # Delta-CDF-complete form: updates emit BOTH images (the join
        # already holds both sides — this is a projection choice, not
        # extra scanning). Incremental consumers that maintain
        # subtractive state (count/sum views) need the pre-image to
        # retract the old contribution; insert/delete rows unchanged.
        pre = [F.col(f"o.{c}").alias(c) for c in cols]
        upd = j.where(F.col("_change_type") == "update")
        return (
            j.select(
                *out,
                F.when(F.col("_change_type") == "update", "update_post")
                .otherwise(F.col("_change_type"))
                .alias("_change_type"),
            )
            .unionByName(
                upd.select(*pre, F.lit("update_pre").alias("_change_type"))
            )
        )

    def field_map(self) -> dict[str, FieldType]:
        fm = {
            f.name: f.field_type
            for f in self.schema.fields
            if f.field_type not in (FieldType.JSON,)
        }
        return fm

    # --------------------------------------------------------------- insert

    @_writer_locked
    def insert(self, records: list[dict], *, upsert: bool = False) -> dict:
        """Batch JSON insert (reference S1, web_controller.hpp:436-507 →
        table_segment_mvp.cpp:455-814). Returns {"inserted": n,
        "skipped": m}; invalid sparse rows and duplicate PKs skip,
        missing required fields fail the batch (INVALID_RECORD)."""
        meta = self._load_meta()
        capacity = self._capacity(meta)
        if len(records) + self._count(meta) > capacity:
            # reference error text verbatim (table_segment_mvp.cpp:476-481);
            # DB_UNEXPECTED_ERROR → HTTP 500, as the reference returns
            raise VectorDBError(
                "DB_UNEXPECTED_ERROR",
                f"Currently, each table in this database can hold up to "
                f"{capacity} records. To insert more records, please "
                f"unload the database and reload with a larger vectorScale "
                f"parameter.",
            )
        rows: list[tuple] = []
        skipped = 0
        next_row_id = meta["next_row_id"]
        pk_field = self.schema.primary_key
        seen_pks: dict[Any, int] = {}  # pk -> position in rows
        for rec in records:
            try:
                vals = self._validate_record(rec)
            except _SkipRecord:
                skipped += 1
                continue
            if pk_field is not None:
                pk = vals[pk_field.name]
                if pk in seen_pks:
                    if upsert:
                        # last wins within the batch (:652-741)
                        rows[seen_pks[pk]] = None  # type: ignore[call-overload]
                    else:
                        skipped += 1
                        continue
                seen_pks[pk] = len(rows)
            rows.append(tuple(vals[f.name] for f in self.schema.fields) + (next_row_id,))
            next_row_id += 1
        rows = [r for r in rows if r is not None]

        # PKs already in the table
        existing_pks: set = set()
        if pk_field is not None and seen_pks:
            pks = list(seen_pks)
            # same range-pruned conflict check as insert_df (r11):
            # integer- and (r12) string-PK point inserts read only the
            # segments whose manifest min/max overlaps the batch's key
            # range
            if pk_field.field_type.is_int and all(
                isinstance(k, int) and not isinstance(k, bool) for k in pks
            ):
                snapshot = self.scan_df(
                    extra_bounds={
                        pk_field.name: (float(min(pks)), float(max(pks)))
                    }
                )
            elif pk_field.field_type.is_string and all(
                isinstance(k, str) for k in pks
            ):
                snapshot = self.scan_df(
                    extra_bounds={pk_field.name: (min(pks), max(pks))}
                )
            else:
                snapshot = self.df()
            existing = (
                snapshot.where(F.col(pk_field.name).isin(pks))
                .select(pk_field.name)
                .collect()
            )
            existing_pks = {r[0] for r in existing}
        if pk_field is not None and existing_pks and not upsert:
            before = len(rows)
            pk_idx = [f.name for f in self.schema.fields].index(pk_field.name)
            rows = [r for r in rows if r[pk_idx] not in existing_pks]
            skipped += before - len(rows)

        new_df = self.spark.createDataFrame(
            rows, self.schema.to_spark_schema(with_row_id=True)
        )
        new_df = self._apply_ingest_transforms(new_df)

        if pk_field is not None and existing_pks and upsert:
            # replaced PKs leave via the segment-granular COW path
            # (only their segments rewrite); the batch lands as one
            # add segment in the same atomic commit. The key list is
            # already in hand, so the size and range hints cost zero
            # extra Spark jobs.
            self._bump_mutation_seq(meta)
            vals = list(seen_pks)
            pk_rng = None
            if vals and (
                all(
                    isinstance(k, int) and not isinstance(k, bool)
                    for k in vals
                )
                or all(isinstance(k, str) for k in vals)
            ):
                pk_rng = (min(vals), max(vals))
            self._cow_upsert(
                new_df, meta, pk_field, next_row_id,
                batch_rows=len(rows), pk_range=pk_rng,
            )
        else:
            self._append(new_df, meta, next_row_id)
        return {"inserted": len(rows), "skipped": skipped}

    @_writer_locked
    def insert_df(self, df: DataFrame, *, upsert: bool = False) -> dict:
        """Distributed bulk ingest: same semantics, no driver loop.
        PK dedup via window row_number over _row_id (SURVEY.md §1.5)."""
        from pyspark.sql import Window as W

        meta = self._load_meta()
        start = meta["next_row_id"]
        cols = [f.name for f in self.schema.fields if not f.is_index_field]
        # Cast DENSE VECTOR columns to their declared array<float> at
        # ingest (the row path always stored float32, via
        # createDataFrame over the declared schema): without this a
        # double-element batch landed as a DOUBLE-typed segment next
        # to FLOAT-typed siblings — masked while upserts consolidated
        # everything into one rewritten base, fatal once COW keeps
        # heterogeneous segments live side by side (Parquet readers
        # refuse mixed element types). Scalar and sparse columns keep
        # their longstanding pass-through behavior (several gates
        # deliberately feed int data under a STRING declaration and
        # read back what they stored).
        dense = {
            f.name for f in self.schema.fields if f.field_type.is_dense_vector
        }
        new_df = df.select(
            *[
                F.col(c).cast("array<float>").alias(c) if c in dense
                else F.col(c)
                for c in cols
            ]
        )
        # Assign batch-order row ids WITHOUT a global sort: a
        # row_number() over a partitionless window would funnel the
        # whole batch through one task. monotonically_increasing_id
        # encodes (partition_id << 33) | position, so contiguous ids
        # fall out of per-partition offsets: one partial-agg action
        # collects partition counts (a few longs per partition), the
        # driver prefix-sums them, and a broadcast join adds the
        # offsets back — the id order is identical to sorting by the
        # monotonic id, with no single-task stage anywhere.
        new_df = new_df.withColumn("_mono", F.monotonically_increasing_id())
        pid = F.shiftrightunsigned(F.col("_mono"), 33)
        pos = F.col("_mono").bitwiseAND(F.lit((1 << 33) - 1))
        # the same partition-counts action also carries the batch's PK
        # range (r12): min/max over the PRE-dedup batch equals the
        # post-dedup range — dedup only drops duplicate keys — so the
        # conflict-check pruning bounds below cost zero extra jobs
        pk_field = self.schema.primary_key
        range_pk = pk_field is not None and (
            pk_field.field_type.is_int or pk_field.field_type.is_string
        )
        sel = [pid.alias("_pid")]
        pagg = [F.count(F.lit(1)).alias("c")]
        if range_pk:
            sel.append(F.col(pk_field.name).alias("_pkv"))
            pagg += [F.min("_pkv").alias("_lo"), F.max("_pkv").alias("_hi")]
        prows = new_df.select(*sel).groupBy("_pid").agg(*pagg).collect()
        pcounts = sorted((int(r["_pid"]), int(r["c"])) for r in prows)
        pk_lo = pk_hi = None
        if range_pk:
            los = [r["_lo"] for r in prows if r["_lo"] is not None]
            his = [r["_hi"] for r in prows if r["_hi"] is not None]
            if los:
                pk_lo, pk_hi = min(los), max(his)
        offsets, acc = [], 0
        for p, c in pcounts:
            offsets.append((p, acc))
            acc += c
        # _row_id values span [start, start+total) over the PRE-dedup
        # batch; rows dropped by PK dedup / anti-join leave holes, so the
        # cursor must advance by the full batch size or later inserts
        # would reuse ids still present in kept rows.
        total = acc
        off_df = self.spark.createDataFrame(offsets, "_pid long, _off long")
        new_df = (
            new_df.withColumn("_pid", pid)
            .withColumn("_pos", pos)
            .join(F.broadcast(off_df), "_pid")
            .withColumn(
                "_row_id", (F.lit(start) + F.col("_off") + F.col("_pos")).cast("long")
            )
            .drop("_mono", "_pid", "_pos", "_off")
        )
        inserted_df = new_df
        if pk_field is not None:
            keep = (
                F.row_number()
                .over(
                    W.partitionBy(pk_field.name).orderBy(
                        F.col("_row_id").desc() if upsert else F.col("_row_id").asc()
                    )
                )
                == 1
            )
            inserted_df = new_df.withColumn("_keep", keep).where("_keep").drop("_keep")
            if upsert:
                for fld in self.schema.fields:
                    if fld.is_index_field:
                        inserted_df = self._embed_index_field(inserted_df, fld)
                inserted_df = self._apply_ingest_transforms(inserted_df)
                self._bump_mutation_seq(meta)
                # hints from the partition-counts action: the
                # pre-dedup total is a safe SUPERSET for the broadcast
                # size gate, and the PK range survives dedup verbatim
                n = self._cow_upsert(
                    inserted_df, meta, pk_field, start + total,
                    batch_rows=total,
                    pk_range=(pk_lo, pk_hi) if range_pk else None,
                )
                return {"inserted": n, "skipped": 0}
            # PK-conflict check against a RANGE-PRUNED snapshot, not
            # the whole table (r11): only segments whose manifest
            # min/max overlaps the batch's PK range can hold a
            # conflict, so for an integer PK the anti-join's build
            # side shrinks to the overlapping segments — on an
            # append-mostly table with fresh keys that is usually the
            # newest segment or nothing. Safe superset by
            # construction: a conflicting key lies inside the batch
            # range AND inside its segment's [min, max], so that
            # segment always survives pruning; missing stats keep the
            # segment (scan_df's conservative rule). String PKs prune
            # on the exact manifest string stats (r12); other PK types
            # fall back to the full PK-column scan.
            if range_pk:
                # bounds came free with the partition-counts action
                if pk_lo is None:
                    existing = self.df().select(pk_field.name).limit(0)
                elif pk_field.field_type.is_string:
                    existing = self.scan_df(
                        extra_bounds={pk_field.name: (pk_lo, pk_hi)}
                    ).select(pk_field.name)
                else:
                    existing = self.scan_df(
                        extra_bounds={
                            pk_field.name: (float(pk_lo), float(pk_hi))
                        }
                    ).select(pk_field.name)
            else:
                existing = self.df().select(pk_field.name)
            inserted_df = inserted_df.join(existing, pk_field.name, "left_anti")
        for fld in self.schema.fields:
            if fld.is_index_field:
                inserted_df = self._embed_index_field(inserted_df, fld)
        inserted_df = self._apply_ingest_transforms(inserted_df)
        # the write's own Observation counts the inserted rows — no
        # separate count action re-running the dedup + anti-join (r12)
        n = self._append(inserted_df, meta, start + total)
        return {"inserted": n, "skipped": 0}

    def _embed_index_field(self, df: DataFrame, fld: FieldSchema) -> DataFrame:
        src = self.index_sources.get(fld.name)
        if src is None or self.embedder is None:
            raise VectorDBError(
                "EMBEDDING_ERROR", f"No embedder/source for index field {fld.name}."
            )
        return df.withColumn(fld.name, embed_column(self.embedder, src))

    def _apply_ingest_transforms(self, df: DataFrame) -> DataFrame:
        """COSINE normalization — the reference stores normalized
        vectors so cosine ≡ dot on unit vectors (SURVEY.md §4)."""
        for f in self.schema.fields:
            if f.field_type.is_dense_vector and f.metric == "COSINE":
                df = df.withColumn(f.name, l2_normalize(f.name))
            elif f.field_type.is_sparse_vector and f.metric == "COSINE":
                df = df.withColumn(f.name, sparse_l2_normalize(f.name))
        return df

    def _validate_record(self, rec: dict) -> dict:
        vals: dict[str, Any] = {}
        for f in self.schema.fields:
            if f.is_index_field:
                # populated by the embedder below
                continue
            if f.name not in rec or rec[f.name] is None:
                raise VectorDBError(
                    "INVALID_RECORD", f"Field {f.name} is missing in the record."
                )
            v = rec[f.name]
            ft = f.field_type
            if ft.is_dense_vector:
                if not isinstance(v, (list, tuple)) or len(v) != f.dimension:
                    raise VectorDBError(
                        "INVALID_RECORD",
                        f"Vector field {f.name} must have dimension {f.dimension}.",
                    )
                vals[f.name] = [float(x) for x in v]
            elif ft.is_sparse_vector:
                vals[f.name] = _validate_sparse(v, f.dimension)
            elif ft == FieldType.GEO_POINT:
                if (
                    not isinstance(v, dict)
                    or not isinstance(v.get("latitude"), (int, float))
                    or not isinstance(v.get("longitude"), (int, float))
                    or isinstance(v.get("latitude"), bool)
                    or isinstance(v.get("longitude"), bool)
                ):
                    raise VectorDBError(
                        "INVALID_RECORD",
                        f"Geo field {f.name} must be "
                        "{latitude: number, longitude: number}.",
                    )
                lat = max(-90.0, min(90.0, float(v["latitude"])))
                lon = max(-180.0, min(180.0, float(v["longitude"])))
                vals[f.name] = Row(latitude=lat, longitude=lon)
            elif ft == FieldType.JSON:
                vals[f.name] = v if isinstance(v, str) else json.dumps(v)
            elif ft == FieldType.BOOL:
                vals[f.name] = bool(v)
            elif ft.is_int:
                vals[f.name] = int(v)
            elif ft.is_real:
                vals[f.name] = float(v)
            else:
                vals[f.name] = str(v)
        if self.embedder is not None:
            for fname, src in self.index_sources.items():
                vals[fname] = self.embedder.embed_batch([vals[src]])[0]
        elif self.index_sources:
            raise VectorDBError(
                "EMBEDDING_ERROR", "Table has auto-embedding indexes but no embedder."
            )
        return vals

    # ---------------------------------------------------------------- write

    def _count(self, meta: dict) -> int:
        """Live row count. Maintained transactionally in the manifest
        (every commit records the delta from parquet footer metadata),
        so capacity checks / statistics are O(1), not an O(table) scan
        per insert. Falls back to a real count for pre-row_count
        manifests."""
        if meta.get("row_count") is not None:
            return int(meta["row_count"])
        if not meta["files"]:
            return 0
        return self.df().count()

    def _record_history(self, meta: dict) -> None:
        meta.setdefault("history", []).append(
            {"version": meta["version"], "files": list(meta["files"])}
        )

    def _dir_count(self, name: str) -> int:
        """Row count of a just-written segment dir — parquet footer
        metadata only (Spark answers unfiltered count(*) from footers),
        never a data scan."""
        return int(self.spark.read.parquet(os.path.join(self.path, name)).count())

    def _segment_stats(self, name: str) -> dict[str, list]:
        """Per-segment min/max of the INTEGER fields, from parquet
        FOOTER metadata (spark.sql.parquet.aggregatePushdown — no data
        scan), recorded in the manifest for driver-side segment
        skipping (expr/prune.py). Integer-only on purpose: int footer
        stats are exact, while float stats are unreliable under NaN and
        string stats truncate."""
        return self._segment_stats_count(name)[0]

    # string-PK stats above this length are not recorded (manifest
    # bloat guard); the segment then simply never prunes on the PK
    # (mutations rewrite it like any other candidate — bytes written
    # are still bounded by candidate kept-rows, same as the legacy
    # consolidation's whole-base write)
    STRING_STAT_MAX_LEN = 256

    def _string_stat_pk(self, columns) -> str | None:
        """The STRING primary key, when stats for it should be
        recorded (r12: the reference's PK domain includes STRING,
        basic_meta_impl.cpp:370-378 — without exact string min/max a
        string-keyed table full-rewrites on every delete/upsert, the
        write amplification COW exists to kill). Exact values are
        computed by aggregate at segment-write time, NOT read from
        parquet footers, whose string stats truncate."""
        pk = self.schema.primary_key
        if (
            pk is not None
            and pk.field_type.is_string
            and pk.name in columns
        ):
            return pk.name
        return None

    def _stat_agg_exprs(self, columns) -> tuple[list[str], str | None, list]:
        """(int stat columns, string-PK column, aggregate expressions)
        for the per-segment stats contract — shared by the footer
        read-back, the COW staging batch pass, and the observed-write
        path so the three can never drift."""
        cols = [
            f.name
            for f in self.schema.fields
            if f.field_type.is_int and f.name in columns
        ]
        if "_row_id" in columns:
            # engine-assigned, monotone with ingest order: its range
            # lets every index REFRESH prune the tail scan to the
            # segments written after the last build (r12) — at scale
            # the difference between reading the tail and re-reading
            # the table per refresh
            cols.append("_row_id")
        spk = self._string_stat_pk(columns)
        aggs = [F.count(F.lit(1)).alias("_n")]
        for c in cols:
            aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
        if spk:
            aggs += [F.min(spk).alias("_slo"), F.max(spk).alias("_shi")]
        return cols, spk, aggs

    def _stats_from_row(self, row, cols: list[str], spk: str | None) -> dict:
        stats = {
            c: [int(row[f"lo_{c}"]), int(row[f"hi_{c}"])]
            for c in cols
            if row[f"lo_{c}"] is not None
        }
        if (
            spk
            and row["_slo"] is not None
            and len(row["_slo"]) <= self.STRING_STAT_MAX_LEN
            and len(row["_shi"]) <= self.STRING_STAT_MAX_LEN
        ):
            stats[spk] = [row["_slo"], row["_shi"]]
        return stats

    def _segment_stats_count(self, name: str) -> tuple[dict[str, list], int]:
        """Pruning stats AND row count of an already-written segment in
        ONE aggregate (r12: the commit path used to run a count job
        plus a stats job per new segment — two of the fixed per-commit
        jobs behind the measured ~0.45 commits/s floor). Integer
        min/max and the count come from parquet FOOTER metadata
        (aggregatePushdown); when the table has a STRING primary key
        its exact min/max joins the same aggregate, which then runs as
        a column-pruned scan instead (string footer stats truncate, so
        pushdown is off the table for them by design). Fresh writes
        avoid even this job — see _write_segment_observed."""
        self.spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        df = self.spark.read.parquet(os.path.join(self.path, name))
        cols, spk, aggs = self._stat_agg_exprs(df.columns)
        row = df.agg(*aggs).first()
        return self._stats_from_row(row, cols, spk), int(row["_n"])

    def _write_segment_observed(
        self, df: DataFrame, name: str
    ) -> tuple[dict[str, list], int]:
        """``_write_segment`` with the pruning stats and row count
        captured DURING the write action (Observation metrics ride the
        write job and are exact for successful queries), so a commit
        pays ONE Spark job for write+stats instead of a write job plus
        a read-back aggregate — another slice of the fixed per-commit
        floor (r12)."""
        from pyspark.sql import Observation

        if self.partition_by == "_cluster" and "_cluster" not in df.columns:
            df = self._assign_cluster(df)
        cols, spk, aggs = self._stat_agg_exprs(df.columns)
        # unnamed Observation -> UUID name: two tables writing
        # same-named segments concurrently (streaming tests) must not
        # share a metrics key
        obs = Observation()
        writer = df.observe(obs, *aggs).write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(self.partition_by)
        writer.parquet(os.path.join(self.path, name))
        m = obs.get
        return self._stats_from_row(m, cols, spk), int(m["_n"])

    def _append(self, new_df: DataFrame, meta: dict, next_row_id: int) -> int:
        """Append commit; returns the number of rows written (from the
        write job's own Observation — callers must not run a separate
        count action over the ingest pipeline)."""
        before = self._count(meta)  # resolve before files change (legacy fallback)
        self._record_history(meta)
        version = meta["version"] + 1
        name = f"add_{version}"
        st, n = self._write_segment_observed(new_df, name)
        meta["files"].append(name)
        meta["version"] = version
        meta["next_row_id"] = next_row_id
        meta["row_count"] = before + self._register_segment_meta(
            meta, name, stats=st, rows=n
        )
        meta["index_sources"] = self.index_sources
        self._save_meta(meta)
        return n

    @staticmethod
    def _bump_mutation_seq(meta: dict) -> None:
        """Count row-REMOVING commits (delete, upsert consolidation).
        Indexes stamp the seq at build time; a search whose manifest
        seq still matches KNOWS the index holds no dead ids and skips
        the dead-id semi-join — the common no-deletes case pays zero
        extra base scans. Appends and compaction (row-preserving)
        leave the seq alone."""
        meta["mutation_seq"] = int(meta.get("mutation_seq", 0)) + 1

    def _write_base(self, df: DataFrame, meta: dict, next_row_id: int) -> None:
        self._record_history(meta)
        version = meta["version"] + 1
        name = f"base_{version}"
        st, n = self._write_segment_observed(df, name)
        meta["files"] = [name]
        meta["version"] = version
        meta["next_row_id"] = next_row_id
        meta["row_count"] = self._register_segment_meta(
            meta, name, stats=st, rows=n
        )
        meta["index_sources"] = self.index_sources
        self._save_meta(meta)

    # -------------------------------------------------------- maintenance

    @_writer_locked
    def compact(
        self,
        target_partitions: int | None = None,
        *,
        cluster_by: str | None = None,
        k: int = 16,
        seed: int = 42,
        train: str = "kmeans",
        rounds: int = 2,
    ) -> dict:
        """Rewrite the current segment list into ONE base segment (a
        new manifest version). Every ``_append`` (point insert,
        streaming micro-batch) adds a parquet dir, so ingest-heavy
        tables accrue small files — the classic read-amplification
        problem; compaction is the maintenance job that bounds it
        (reference X3's rebuild discipline applied to storage). Old
        versions stay readable (time travel) until ``vacuum``. Safe
        with concurrent readers: the write lands in a fresh dir and the
        manifest swap is atomic.

        ``cluster_by=<dense vector field>`` is the OPTIMIZE-style
        clustered rewrite (the Delta ZORDER idea applied to IVF): fit
        KMeans on the field, write the base hive-partitioned by the
        ``_cluster`` assignment, and persist the centroids in the
        manifest — from then on a probe query's cluster list is a
        PartitionFilters predicate on the BASE scan (whole directories
        skipped, no separate index dir to join back), and later appends
        self-assign their ``_cluster`` from the stored centroids at
        write time (codegen nearest-centroid, k inline distance
        expressions) so the layout survives ingest."""
        meta = self._load_meta()
        n_before = len(meta["files"])
        df = self.df()
        if cluster_by is not None:
            f = self.schema.get(cluster_by)
            if f is None or not f.field_type.is_dense_vector:
                raise VectorDBError(
                    "INVALID_PAYLOAD",
                    f"Field {cluster_by} is not a dense vector field.",
                )
            from vectordb_spark.operators.ann import IVFIndex

            if train not in ("kmeans", "lloyd"):
                raise VectorDBError(
                    "INVALID_PAYLOAD",
                    f"Unknown trainer {train!r}; use kmeans|lloyd.",
                )
            idx = IVFIndex(k=k, seed=seed, metric=f.metric or "EUCLIDEAN")
            if train == "lloyd":
                # the bit-replayable trainer (rebuild's discipline,
                # operators/ann.py build_lloyd) applied to the BASE
                # layout: lets a SQL oracle audit the clustered-compact
                # serving path end-to-end (table_clustered_compact_search)
                df = idx.build_lloyd(
                    df.drop("_cluster"), cluster_by, rounds=rounds
                )
            else:
                df = idx.build(df.drop("_cluster"), cluster_by)
            meta["cluster_layout"] = {
                "field": cluster_by,
                "k": k,
                "seed": seed,
                "train": train,
                "rounds": rounds if train == "lloyd" else None,
                "metric": f.metric or "EUCLIDEAN",
                "centroids": idx.centroids,
                "cluster_sizes": {
                    str(c): n for c, n in (idx.cluster_sizes or {}).items()
                },
                "mean_intra_radius": idx.mean_intra_radius,
                "mean_nn_centroid_dist": (
                    None
                    if idx.mean_nn_centroid_dist is None
                    or math.isinf(idx.mean_nn_centroid_dist)
                    else idx.mean_nn_centroid_dist
                ),
            }
            meta["partition_by"] = self.partition_by = "_cluster"
        if target_partitions:
            df = df.coalesce(max(1, int(target_partitions)))
        self._write_base(df, meta, meta["next_row_id"])
        return {"segmentsBefore": n_before, "segmentsAfter": 1}

    @_writer_locked
    def rewrite_zorder(
        self,
        columns: tuple[str, str],
        *,
        segments: int = 8,
        bits: int = 16,
    ) -> dict:
        """Clustered rewrite on the Morton curve of two INTEGER fields —
        the scalar twin of ``compact(cluster_by=<vector field>)``: lay
        the live rows out z-sorted and cut them into ``segments`` base
        segment dirs. Because z-contiguous runs are tight in BOTH
        source columns, the ordinary per-segment integer min/max stats
        (``_segment_stats``) then prune a two-column rectangle filter
        driver-side — no z column is stored, no query-side change: any
        existing ``scan_df("a >= .. AND b <= ..")`` benefits. This
        breaks the one-sort-order limitation (a partkey-sorted layout
        gives suppkey predicates nothing; the Delta/Databricks OPTIMIZE
        ZORDER discipline over this engine's manifest format).

        Scale shape: boundaries come from a sampled quantile sketch
        (approxQuantile — layout quality, not correctness, depends on
        them), the source snapshot is checkpointed ONCE, and each
        segment write is a filter over it; on a cluster the same layout
        is one repartitionByRange write. Old versions stay readable
        (time travel) until vacuum; readers never block."""
        from vectordb_spark.operators.zorder import z_value_sql

        a, b = columns
        for c in (a, b):
            f = self.schema.get(c)
            if f is None or not f.field_type.is_int:
                raise VectorDBError(
                    "INVALID_PAYLOAD",
                    f"rewrite_zorder requires integer fields, got {c}.",
                )
        meta = self._load_meta()
        n_before = len(meta["files"])
        zdf = (
            self.df()
            .withColumn("_z", F.expr(z_value_sql(a, b, bits)))
            .localCheckpoint()
        )
        n_seg = max(1, int(segments))
        qs = [i / n_seg for i in range(1, n_seg)]
        bounds = zdf.stat.approxQuantile("_z", qs, 0.001) if qs else []
        self._record_history(meta)
        version = meta["version"] + 1
        names: list[str] = []
        total = 0
        for i in range(n_seg):
            lo = bounds[i - 1] if i > 0 else None
            hi = bounds[i] if i < n_seg - 1 else None
            part = zdf
            if lo is not None:
                part = part.where(F.col("_z") > lo)
            if hi is not None:
                part = part.where(F.col("_z") <= hi)
            part = part.sortWithinPartitions("_z").drop("_z")
            name = f"zrw_{version}_{i}"
            cnt_df = part.localCheckpoint()  # freeze before the dir write
            n = cnt_df.count()
            if n == 0:
                continue  # duplicate-heavy boundary collapsed a bucket
            self._write_segment(cnt_df, name)
            names.append(name)
            total += n
        meta["files"] = names
        meta["version"] = version
        meta["row_count"] = total
        zst = {n: self._segment_stats_count(n) for n in names}
        meta["segment_stats"] = {n: s for n, (s, _c) in zst.items()}
        meta["segment_rows"] = {n: c for n, (_s, c) in zst.items()}
        meta["segment_bytes"] = {n: self._walk_bytes(n) for n in names}
        meta["index_sources"] = self.index_sources
        self._save_meta(meta)
        return {"segmentsBefore": n_before, "segmentsAfter": len(names)}

    def _cluster_layout_index(self, meta: dict | None = None):
        """Reconstruct the coarse quantizer from the manifest's
        persisted cluster layout (None if the table was never
        cluster-compacted)."""
        from vectordb_spark.operators.ann import IVFIndex

        info = (meta or self._load_meta()).get("cluster_layout")
        if not info:
            return None
        idx = IVFIndex(k=info["k"], seed=info["seed"], metric=info["metric"])
        idx.centroids = info["centroids"]
        idx.cluster_sizes = {
            int(c): int(n) for c, n in (info.get("cluster_sizes") or {}).items()
        }
        idx.mean_intra_radius = info.get("mean_intra_radius")
        nn = info.get("mean_nn_centroid_dist")
        idx.mean_nn_centroid_dist = float("inf") if nn is None else float(nn)
        return idx

    def _assign_cluster(self, df: DataFrame) -> DataFrame:
        """Nearest stored centroid as a codegen Column — k inline
        distance expressions + array argmin, no shuffle, no UDF. Keeps
        appended segments in the clustered layout."""
        from vectordb_spark.functions.distance import l2_squared, vector_literal

        info = self._load_meta().get("cluster_layout")
        if not info:
            raise VectorDBError(
                "INVALID_PAYLOAD",
                "Table is partitioned by _cluster but has no cluster "
                "layout in the manifest.",
            )
        field = info["field"]
        dists = F.array(
            *[
                l2_squared(F.col(field), vector_literal(c))
                for c in info["centroids"]
            ]
        )
        return df.withColumn(
            "_cluster",
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
        )

    # Segment dirs younger than this survive vacuum even when
    # unreferenced: an in-flight reader that loaded the manifest just
    # before a compact+vacuum may still have them in its planned scan.
    # Immutable segments + atomic manifest swap make reads lock-free
    # against appends; this grace window extends that to vacuum
    # (the Delta VACUUM retention-period discipline, scaled down).
    VACUUM_GRACE_SECONDS = 300.0

    @_writer_locked
    def vacuum(self, keep_history: int = 0, *, grace_seconds: float | None = None) -> dict:
        """Drop time-travel history beyond the newest ``keep_history``
        entries and delete segment dirs no version references anymore —
        except dirs modified within the retention grace, which an
        in-flight lock-free reader may still be scanning. Single-writer
        job, like all mutations."""
        import shutil
        import time

        grace = (
            self.VACUUM_GRACE_SECONDS if grace_seconds is None else grace_seconds
        )
        meta = self._load_meta()
        hist = meta.get("history", [])
        kept = hist[len(hist) - keep_history :] if keep_history > 0 else []
        referenced = set(meta["files"])
        for h in kept:
            referenced.update(h["files"])
        # live index dirs: current version + refresh deltas, for every
        # indexed field (vector and text) — superseded versions from
        # rebuilds are unreferenced and reclaimable like old segments
        for fam in ("indexes", "text_indexes", "sparse_indexes"):
            for info in meta.get(fam, {}).values():
                referenced.add(info["dir"])
                referenced.update(info.get("deltas", []))
                referenced.update(info.get("norms_deltas", []))
                if info.get("norms_dir"):
                    referenced.add(info["norms_dir"])
        removed = skipped_recent = 0
        now = time.time()
        for name in sorted(os.listdir(self.path)):
            full = os.path.join(self.path, name)
            if (
                name.startswith(
                    ("add_", "base_", "cow_", "zrw_", "index_",
                     "textindex_", "sparseindex_", "cowstage_")
                )
                and name not in referenced
                and os.path.isdir(full)
            ):
                if now - os.path.getmtime(full) < grace:
                    skipped_recent += 1
                    continue
                shutil.rmtree(full)
                removed += 1
        meta["history"] = kept
        for cache in ("segment_stats", "segment_rows", "segment_bytes"):
            if meta.get(cache):
                meta[cache] = {
                    k: v for k, v in meta[cache].items() if k in referenced
                }
        self._save_meta(meta)
        return {
            "removedSegments": removed,
            "keptVersions": len(kept) + 1,
            "skippedRecent": skipped_recent,
        }

    # --------------------------------------------------------------- delete

    @_writer_locked
    def delete(self, primary_keys: list | None = None, filter: str = "") -> dict:
        """Delete by PK list and/or filter (reference S3,
        db_server.cpp:297-360): with a PK list, a row must match the
        list AND pass the filter; with no list, the filter alone
        decides. One of the two is required (web_controller.hpp:576-595).
        """
        if not primary_keys and not filter:
            raise VectorDBError(
                "INVALID_PAYLOAD", "Delete requires primaryKeys and/or filter."
            )
        cond = F.lit(True)
        if primary_keys:
            pk_field = self.schema.primary_key
            if pk_field is None:
                raise VectorDBError(
                    "DB_UNEXPECTED_ERROR", f"Primary key not found: {self.schema.name}"
                )
            cond = cond & F.col(pk_field.name).isin(primary_keys)
        ast = parse_filter(filter, self.field_map())
        if ast is not None:
            cond = cond & to_spark_column(ast)
        meta = self._load_meta()
        # segment pruning bounds for the COW path: the filter's
        # conjunctive ranges plus the PK list's min/max (integer PKs)
        from vectordb_spark.expr.prune import range_bounds

        bounds = range_bounds(ast)
        if primary_keys:
            pk_field = self.schema.primary_key
            lo = hi = None
            if pk_field.field_type.is_int and all(
                isinstance(k, int) and not isinstance(k, bool)
                for k in primary_keys
            ):
                lo, hi = float(min(primary_keys)), float(max(primary_keys))
            elif pk_field.field_type.is_string and all(
                isinstance(k, str) for k in primary_keys
            ):
                # exact string-PK stats are manifest-recorded (r12),
                # so string key lists prune segments too
                lo, hi = min(primary_keys), max(primary_keys)
            if lo is not None:
                from vectordb_spark.expr.prune import _same_kind

                cur = bounds.get(pk_field.name, (None, None))
                bounds[pk_field.name] = (
                    lo
                    if (cur[0] is None or not _same_kind(lo, cur[0]))
                    else max(lo, cur[0]),
                    hi
                    if (cur[1] is None or not _same_kind(hi, cur[1]))
                    else min(hi, cur[1]),
                )
        self._bump_mutation_seq(meta)
        return {"deleted": self._cow_delete(cond, meta, bounds)}

    # r12: mutations never consolidate (the r11 ≥COW_REWRITE_FRACTION
    # crossover is GONE — the streaming key-overlap rehearsal showed it
    # degenerate: with overlap keys in every micro-batch it collapsed
    # the base to ONE segment on batch 2 and then re-consolidated
    # O(table) bytes every batch forever, because a 1-segment base can
    # never satisfy candidates < fraction again). When candidates span
    # the whole base, the COW rewrite writes the SAME bytes as the
    # consolidation would but PRESERVES the per-segment range
    # structure, so the next local mutation prunes again — the Delta
    # Lake discipline: DML rewrites matched files, OPTIMIZE/compact()
    # defragments. ``COW_DISABLED`` opts a table back into the
    # consolidating legacy path (A/B harnesses, pathological tables).
    COW_DISABLED = False

    def _walk_bytes(self, name: str) -> int:
        total = 0
        for root, _dirs, fnames in os.walk(os.path.join(self.path, name)):
            for fn in fnames:
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
        return total

    def _dir_bytes(self, name: str, meta: dict | None = None) -> int:
        """Segment byte size — manifest-cached (``segment_bytes``,
        recorded once at segment-write time) with a directory-walk
        fallback for manifests written before the cache existed. On
        object storage a per-mutation walk is a per-commit LIST storm
        (VERDICT r11 "what's wrong" #4); with the cache, every
        mutation-path crossover decision reads the manifest only."""
        if meta is not None:
            b = (meta.get("segment_bytes") or {}).get(name)
            if b is not None:
                return int(b)
        return self._walk_bytes(name)

    def _register_segment_meta(
        self,
        meta: dict,
        name: str,
        *,
        stats: dict | None = None,
        rows: int | None = None,
    ) -> int:
        """Record a just-written segment's pruning stats, ROW COUNT and
        byte size in the manifest — the one place all three caches are
        populated, so later mutations and matview crossover checks
        never re-list or re-count the directory. ``stats``/``rows``
        short-circuit the footer job when the caller already computed
        them (the COW staging batch pass). Returns the row count."""
        if stats is None or rows is None:
            s, n = self._segment_stats_count(name)
            stats = s if stats is None else stats
            rows = n if rows is None else rows
        meta.setdefault("segment_stats", {})[name] = stats
        meta.setdefault("segment_rows", {})[name] = int(rows)
        meta.setdefault("segment_bytes", {})[name] = self._walk_bytes(name)
        return int(rows)

    # partition-column tag carrying each kept row's source segment
    # through the single COW rewrite job. The tag value is the PARENT
    # DIRECTORY component of input_file_name() — segment names are
    # [A-Za-z0-9_]+ so their percent-encoded URI form is themselves,
    # which sidesteps the ADVICE r11 failure (the old strip-'file:'-
    # and-relpath mapping broke on table paths containing spaces:
    # matched keys never hit the manifest names, to_rewrite stayed
    # empty while removed>0, and delete() reported rows deleted while
    # leaving them live). Any tag value outside the candidate set
    # raises at commit instead of silently dropping rows.
    _COW_TAG = "_cow_src"

    def _staging_stats(
        self, staging: str
    ) -> tuple[dict[str, dict], dict[str, int]]:
        """Per-SOURCE-segment pruning stats and row counts for every
        rewritten segment from ONE column-pruned scan of the staging
        root (int columns only — the _segment_stats contract), instead
        of a footer job per new dir."""
        from pyspark.sql.types import IntegerType, StringType, StructField

        tag = self._COW_TAG
        # explicit schema: the staging layout is table schema + _row_id
        # under (tag[, partition]) dirs — skipping footer schema
        # inference saves a listing job per mutation, and a DECLARED
        # string partition field parses losslessly instead of through
        # hive type inference
        base = self.schema.to_spark_schema(with_row_id=True)
        fields = list(base.fields)
        names = {f.name for f in fields}
        if self.partition_by and self.partition_by not in names:
            # engine-written cluster key (always int)
            fields.append(StructField(self.partition_by, IntegerType()))
        fields.append(StructField(tag, StringType()))
        df = self.spark.read.schema(
            type(base)(fields)
        ).parquet(staging)
        cols, spk, aggs = self._stat_agg_exprs(df.columns)
        stats: dict[str, dict] = {}
        counts: dict[str, int] = {}
        for row in df.groupBy(tag).agg(*aggs).collect():
            src = row[tag]
            counts[src] = int(row["_n"])
            stats[src] = self._stats_from_row(row, cols, spk)
        return stats, counts

    def _cow_rewrite(
        self,
        meta: dict,
        candidates: list[str],
        keep_fn,
        version: int,
        rows_map: dict[str, int],
    ) -> tuple[list[str], dict[str, int]]:
        """The COW mutation's ONE data pass (VERDICT r11 "what's
        wrong" #1/#2: the old shape scanned candidates once to count
        matches, then ran a serial Spark write job — plus a footer
        count and a footer stats job — per matched segment; a
        scattered-key upsert over a 10k-segment base meant thousands
        of sequential jobs). Now: kept rows of EVERY candidate segment
        are tagged with their source segment and written once via
        ``partitionBy(_cow_src)`` — no shuffle, each scan task holds
        one source segment's rows — and per-source stats + kept-row
        counts come from one column-pruned scan of the staging root.
        Match counts are DERIVED: manifest ``segment_rows`` minus kept
        rows, so the pre-write count pass is gone entirely. Staging
        dirs of candidates with zero matches are discarded (their
        original dirs are retained verbatim in the manifest — the
        false-positive cost is bounded by how loose the range pruning
        is, and NEVER exceeds what the legacy whole-base consolidation
        would write, since candidates ⊆ base); genuinely matched ones
        are renamed into final ``cow_`` dirs and registered. Returns
        (new segment names, matched row counts per source segment)."""
        import shutil
        from urllib.parse import unquote

        tag = self._COW_TAG
        if self.partition_by:
            # hive-partitioned segment roots can't multi-path read
            # (see _df_for_files): per-segment reads tagged with
            # literals, unioned — still exactly one write job
            from functools import reduce

            tagged = reduce(
                lambda a, b: a.unionByName(b),
                [
                    self._df_for_files([f]).withColumn(tag, F.lit(f))
                    for f in candidates
                ],
            )
            part_cols = [tag, self.partition_by]
        else:
            tagged = self._df_for_files(candidates).withColumn(
                tag,
                F.regexp_extract(F.input_file_name(), r"/([^/]+)/[^/]*$", 1),
            )
            part_cols = [tag]
        kept = keep_fn(tagged)
        # no leading underscore: Spark's hidden-path filter warns on
        # underscore-prefixed roots; crash leftovers are vacuum's job
        staging = os.path.join(self.path, f"cowstage_{version}")
        try:
            kept.write.mode("overwrite").partitionBy(*part_cols).parquet(
                staging
            )
            expected = set(candidates)
            by_src: dict[str, str] = {}
            for d in os.listdir(staging):
                if not d.startswith(tag + "="):
                    continue
                src = unquote(d.split("=", 1)[1])
                if src not in expected:
                    raise VectorDBError(
                        "INTERNAL",
                        f"COW rewrite produced rows for unknown source "
                        f"segment {src!r}",
                    )
                by_src[src] = os.path.join(staging, d)
            stats, kept_counts = (
                self._staging_stats(staging) if by_src else ({}, {})
            )
            matched: dict[str, int] = {}
            for f in candidates:
                m = int(rows_map[f]) - int(kept_counts.get(f, 0))
                if m < 0:
                    raise VectorDBError(
                        "INTERNAL",
                        f"segment {f!r} kept more rows than it holds — "
                        f"manifest segment_rows is stale",
                    )
                if m > 0:
                    matched[f] = m
            new_names: list[str] = []
            for i, f in enumerate(f for f in candidates if f in matched):
                if f not in by_src:
                    continue  # every row of f was dropped: segment dies
                name = f"cow_{version}_{i}"
                os.rename(by_src[f], os.path.join(self.path, name))
                new_names.append(name)
                self._register_segment_meta(
                    meta, name,
                    stats=stats.get(f, {}),
                    rows=kept_counts.get(f, 0),
                )
            return new_names, matched
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    def _candidate_rows(
        self, meta: dict, candidates: list[str]
    ) -> dict[str, int]:
        """Per-candidate row counts from the manifest (recorded at
        segment-write time). Pre-cache manifests fall back to ONE
        zero-column count job over all missing segments grouped by
        parent dir (not a footer job per segment — an upgraded
        10k-segment table must not pay 10k serial jobs on its first
        mutation), cached back so the cost is paid once per table.
        Partitioned tables keep the per-segment count (their segment
        counts are compaction-bounded and parent dirs are partition
        values, not segment names)."""
        rows_map = meta.setdefault("segment_rows", {})
        missing = [f for f in candidates if f not in rows_map]
        if not missing:
            return rows_map
        if self.partition_by or len(missing) == 1:
            for f in missing:
                rows_map[f] = self._dir_count(f)
            return rows_map
        paths = [os.path.join(self.path, f) for f in missing]
        counted: dict[str, int] = {}
        for r in (
            self.spark.read.parquet(*paths)
            .groupBy(
                F.regexp_extract(
                    F.input_file_name(), r"/([^/]+)/[^/]*$", 1
                ).alias("_seg")
            )
            .agg(F.count(F.lit(1)).alias("_n"))
            .collect()
        ):
            counted[r["_seg"]] = int(r["_n"])
        expected = set(missing)
        for seg, n in counted.items():
            if seg not in expected:
                raise VectorDBError(
                    "INTERNAL",
                    f"row-count backfill saw unknown segment {seg!r}",
                )
            rows_map[seg] = n
        for f in missing:  # fully written empty dirs
            rows_map.setdefault(f, 0)
        return rows_map

    # COW upsert gives up (legacy consolidating rewrite) above this
    # batch size: the batch-key side is force-broadcast into every
    # rewritten segment's anti-join, so it must stay broadcast-sized.
    COW_UPSERT_MAX_BATCH = 1_000_000

    def _cow_upsert(
        self,
        batch_df: DataFrame,
        meta: dict,
        pk_field,
        next_row_id: int,
        *,
        batch_rows: int | None = None,
        pk_range: tuple | None = None,
    ) -> int:
        """Segment-granular copy-on-write upsert (r11, one-pass r12):
        the legacy path rewrote the ENTIRE live base (anti-join ∪
        batch) on every upsert commit — O(table) per commit. Now the
        batch's PK range prunes candidate segments via manifest stats,
        ONE broadcast-anti-join scan of the candidates writes every
        surviving row (``_cow_rewrite``: single partitionBy job, match
        counts derived from manifest ``segment_rows``), only
        CONFLICTING segments are replaced (surviving rows keep their
        _row_id), and the batch lands as a normal add segment — all in
        ONE atomic manifest version, so readers, time travel, and
        ``changes()`` see exactly the same logical diff as the
        consolidating path (updated PKs pair into update pre/post
        images across the rewritten and added dirs). Falls back to the
        legacy rewrite only when the PK is neither integer nor string,
        stats are missing, the batch exceeds broadcast size, or
        ``COW_DISABLED`` is set — never by a bytes crossover (see the
        COW_DISABLED comment: consolidating on overlap degenerated the
        streaming key-overlap pattern to O(table) per batch forever,
        while COW at worst writes the same bytes once and keeps the
        segment structure prunable)."""
        pk = pk_field.name
        batch_df = batch_df.localCheckpoint()
        # both hints ride actions the callers already ran (the ingest
        # partition-counts job / the row-path key list), so the common
        # path adds NO count or min/max job here (r12)
        n = batch_rows if batch_rows is not None else batch_df.count()
        before = self._count(meta)
        files = list(meta["files"])
        stats = meta.get("segment_stats") or {}

        def _legacy() -> int:
            base = self.df().join(
                batch_df.select(pk), pk, "left_anti"
            )
            full = base.unionByName(batch_df)
            self._write_base(full, meta, next_row_id)
            # batch_df is already PK-deduped by every caller, so its
            # count IS the inserted-rows figure (rare path: one job
            # over the checkpointed batch)
            return batch_df.count()

        str_pk = pk_field.field_type.is_string
        if (
            not (pk_field.field_type.is_int or str_pk)
            or n > self.COW_UPSERT_MAX_BATCH
            or not files
            or not any((stats.get(f) or {}).get(pk) for f in files)
        ):
            return _legacy()
        if pk_range is not None:
            lo, hi = pk_range
        else:
            rng = batch_df.agg(F.min(pk), F.max(pk)).first()
            lo, hi = rng[0], rng[1]
        if lo is None:
            return _legacy()
        bounds = {pk: ((lo, hi) if str_pk else (float(lo), float(hi)))}
        from vectordb_spark.expr.prune import segment_overlaps

        candidates = [
            f for f in files if segment_overlaps(stats.get(f), bounds)
        ]
        if self.COW_DISABLED:
            return _legacy()
        rows_map = self._candidate_rows(meta, candidates)
        self._record_history(meta)
        version = meta["version"] + 1
        new_names: list[str] = []
        matched: dict[str, int] = {}
        if candidates:
            bkeys = F.broadcast(batch_df.select(pk))
            new_names, matched = self._cow_rewrite(
                meta,
                candidates,
                lambda t: t.join(bkeys, pk, "left_anti"),
                version,
                rows_map,
            )
        removed = sum(matched.values())
        new_files = [f for f in files if f not in matched] + new_names
        add_name = f"add_{version}"
        add_st, add_n = self._write_segment_observed(batch_df, add_name)
        new_files.append(add_name)
        self._register_segment_meta(meta, add_name, stats=add_st, rows=add_n)
        meta["files"] = new_files
        meta["version"] = version
        meta["next_row_id"] = next_row_id
        meta["row_count"] = before - removed + add_n
        meta["index_sources"] = self.index_sources
        self._save_meta(meta)
        return add_n

    def _cow_delete(self, cond, meta: dict, bounds: dict) -> int:
        """Segment-granular copy-on-write delete (r11, one-pass r12).
        The legacy path rewrote the ENTIRE live base into one segment
        on every delete — O(table) per commit, the write-path twin of
        the matview full-rebuild problem. Now: (1) manifest min/max
        stats prune the candidate segments driver-side (a delete whose
        PK range or filter ranges miss a segment cannot touch it);
        (2) ONE scan of the candidates writes every ``~cond`` survivor
        tagged by source segment (``_cow_rewrite``); match counts are
        DERIVED from manifest ``segment_rows`` minus staged survivors,
        so candidates with zero matches are RETAINED as-is (same dirs
        in the manifest) and there is no separate count pass;
        (3) only matched segments are replaced (survivors preserve
        their _row_id, so index delta dirs stay valid); (4) mutations
        never consolidate (see the COW_DISABLED comment) — at worst
        (candidates = whole base) the rewrite writes the same bytes a
        consolidation would, once, and keeps the per-segment range
        structure so the NEXT mutation prunes; ``compact()`` remains
        the defragmenter. Changefeed semantics are unchanged:
        ``changes()`` diffs by PK with content-equality cancellation,
        so retained dirs prune at file level and surviving rows in
        rewritten dirs cancel — only the deleted rows surface, exactly
        as before (pinned in tests)."""
        files = list(meta["files"])
        stats = meta.get("segment_stats") or {}
        before = self._count(meta)
        candidates = files
        if bounds and stats:
            from vectordb_spark.expr.prune import segment_overlaps

            candidates = [
                f for f in files if segment_overlaps(stats.get(f), bounds)
            ]

        def _legacy() -> int:
            kept = self.df().where(~F.coalesce(cond, F.lit(False)))
            # the consolidation commit records the surviving count
            # from parquet footers — no extra O(table) count actions
            self._write_base(kept, meta, meta["next_row_id"])
            return before - int(meta["row_count"])

        if self.COW_DISABLED:
            return _legacy()
        rows_map = self._candidate_rows(meta, candidates)
        self._record_history(meta)
        version = meta["version"] + 1
        new_names: list[str] = []
        matched: dict[str, int] = {}
        if candidates:
            new_names, matched = self._cow_rewrite(
                meta,
                candidates,
                lambda t: t.where(~F.coalesce(cond, F.lit(False))),
                version,
                rows_map,
            )
        removed = sum(matched.values())
        new_files = [f for f in files if f not in matched] + new_names
        meta["files"] = new_files
        meta["version"] = version
        meta["row_count"] = before - removed
        meta["index_sources"] = self.index_sources
        self._save_meta(meta)
        return removed

    # ---------------------------------------------------------------- query

    def _resolve_query_field(
        self, query_field: str | None, query_index: str | None
    ) -> FieldSchema:
        if query_field and query_index:
            raise VectorDBError(
                "INVALID_PAYLOAD",
                "queryField and queryIndex are mutually exclusive.",
            )
        name = query_field or query_index
        if name:
            f = self.schema.get(name)
            if f is None or not f.field_type.is_vector:
                raise VectorDBError(
                    "INVALID_PAYLOAD", f"Field {name} is not a vector field."
                )
            return f
        vecs = self.schema.vector_fields()
        if len(vecs) != 1:
            raise VectorDBError(
                "INVALID_PAYLOAD",
                "queryField is required when the table has multiple vector fields.",
            )
        return vecs[0]

    def search_df(
        self,
        query_vector,
        *,
        query_field: str | None = None,
        query_index: str | None = None,
        limit: int,
        filter: str = "",
    ) -> DataFrame:
        """Top-K scored snapshot with `_distance`, pre/post filter per
        @distance usage — the composable DataFrame surface."""
        f = self._resolve_query_field(query_field, query_index)
        ast = parse_filter(filter, self.field_map())
        df = self.df()
        if f.field_type.is_sparse_vector:
            q = _normalize_sparse_query(query_vector, f)
            qcol = F.struct(
                F.array(*[F.lit(int(i)) for i in q["indices"]]).alias("indices"),
                F.array(*[F.lit(float(x)) for x in q["values"]])
                .cast("array<float>")
                .alias("values"),
            )
            dist = sparse_distance_for_metric(f.metric, F.col(f.name), qcol)
        else:
            q = _normalize_dense_query(query_vector, f)
            qcol = F.array(*[F.lit(float(x)) for x in q])
            dist = distance_for_metric(f.metric, F.col(f.name), qcol)

        post = ast is not None and references_distance(ast)
        if ast is not None and not post:
            df = df.where(to_spark_column(ast))
        df = df.withColumn("_distance", dist)
        if post:
            df = df.where(to_spark_column(ast))
        return df.orderBy(F.col("_distance").asc(), F.col("_row_id").asc()).limit(limit)

    def query(
        self,
        *,
        query_vector=None,
        query_text: str | None = None,
        query_field: str | None = None,
        query_index: str | None = None,
        limit: int,
        response: list[str] | None = None,
        filter: str = "",
        with_distance: bool = False,
        facets: list[dict] | None = None,
    ) -> dict:
        """Vector KNN query (reference §3.1/§3.2). ``query_text``
        embeds via the table's index (E2 semantic search)."""
        if query_text is not None:
            if self.embedder is None:
                raise VectorDBError("EMBEDDING_ERROR", "No embedder configured.")
            query_vector = self.embedder.embed_batch([query_text])[0]
            if query_index is None and not query_field:
                idx_fields = [f.name for f in self.schema.fields if f.is_index_field]
                if len(idx_fields) != 1:
                    raise VectorDBError(
                        "INVALID_PAYLOAD", "queryIndex is required for text query."
                    )
                query_index = idx_fields[0]
        if query_vector is None:
            raise VectorDBError("INVALID_PAYLOAD", "queryVector is required.")
        topk = self.search_df(
            query_vector,
            query_field=query_field,
            query_index=query_index,
            limit=limit,
            filter=filter,
        )
        topk = topk.cache()
        try:
            records = self._project(topk, response, with_distance=with_distance)
            out: dict = {"result": records}
            if facets:
                from vectordb_spark.operators.facets import compute_facets, parse_facets

                specs = parse_facets(facets, self.field_map())
                out["facets"] = compute_facets(
                    topk, specs, self.field_map(), has_distance=True
                )
            return out
        finally:
            topk.unpersist()

    # ------------------------------------------------------------------ get

    def get(
        self,
        *,
        response: list[str] | None = None,
        filter: str = "",
        skip: int = 0,
        limit: int = DEFAULT_GET_LIMIT,
        primary_keys: list | None = None,
        facets: list[dict] | None = None,
    ) -> dict:
        """Attribute scan / point reads (reference §3.3): PK-list route,
        else filtered scan in insertion (_row_id) order with
        skip/limit.

        This is the API-parity JSON route — it MATERIALIZES the page on
        the driver (like the reference returns JSON), sized for point
        reads and pages. Bulk consumers must stay distributed: use
        ``df()`` (full snapshot incl. time travel) or ``search_df``
        and keep the result a DataFrame."""
        extra_bounds = None
        if primary_keys:
            pk_field = self.schema.primary_key
            if pk_field is None:
                raise VectorDBError(
                    "DB_UNEXPECTED_ERROR", f"Primary key not found: {self.schema.name}"
                )
            if pk_field.field_type.is_int and primary_keys:
                nums = [int(k) for k in primary_keys]
                extra_bounds = {pk_field.name: (min(nums), max(nums))}
        df = self.scan_df(filter, extra_bounds=extra_bounds)
        if primary_keys:
            df = df.where(F.col(pk_field.name).isin(primary_keys))
        df = df.orderBy("_row_id")
        if skip:
            df = df.offset(skip)
        df = df.limit(limit)
        df = df.cache()
        try:
            records = self._project(df, response, with_distance=False)
            out: dict = {"result": records}
            if facets:
                from vectordb_spark.operators.facets import compute_facets, parse_facets

                specs = parse_facets(facets, self.field_map())
                out["facets"] = compute_facets(
                    df, specs, self.field_map(), has_distance=False
                )
            return out
        finally:
            df.unpersist()

    # ------------------------------------------------------------- projection

    def _project(
        self, df: DataFrame, response: list[str] | None, *, with_distance: bool
    ) -> list[dict]:
        """Reference P1 (table_mvp.cpp:462-594): default = all non-index
        fields; JSON strings projected back as objects; sparse/geo as
        wire-format dicts; @distance appended when requested."""
        if response:
            fields = []
            for name in response:
                if name == "@distance":
                    continue
                f = self.schema.get(name)
                if f is None:
                    raise VectorDBError("INVALID_PAYLOAD", f"Unknown field {name}.")
                fields.append(f)
            want_distance = with_distance or "@distance" in response
        else:
            fields = self.schema.projectable_fields()
            want_distance = with_distance
        cols = [f.name for f in fields]
        if want_distance and "_distance" in df.columns:
            cols.append("_distance")
        rows = df.select(*cols).collect()
        out = []
        for r in rows:
            rec: dict[str, Any] = {}
            for f in fields:
                v = r[f.name]
                if f.field_type == FieldType.JSON:
                    rec[f.name] = json.loads(v) if isinstance(v, str) else v
                elif f.field_type.is_sparse_vector:
                    rec[f.name] = {
                        "indices": list(v.indices),
                        "values": [float(x) for x in v.values],
                    }
                elif f.field_type == FieldType.GEO_POINT:
                    rec[f.name] = {"latitude": v.latitude, "longitude": v.longitude}
                elif f.field_type.is_dense_vector:
                    rec[f.name] = [float(x) for x in v]
                else:
                    rec[f.name] = v
            if want_distance and "_distance" in df.columns:
                rec["@distance"] = float(r["_distance"])
            out.append(rec)
        return out

    # ------------------------------------------------------------ utilities

    # ------------------------------------------------------------- indexes

    @_writer_locked
    def rebuild(
        self,
        field: str,
        *,
        index_type: str = "IVF",
        k: int = 16,
        seed: int = 42,
        train: str = "kmeans",
        rounds: int = 2,
        train_mod: int | None = None,
        train_keep: int | None = None,
    ) -> dict:
        """Batch ANN index (re)build — the reference's background
        rebuild (X3, table_mvp.cpp:94-203) as an explicit job. Writes a
        new index version: the vector column + _row_id reorganized into
        a parquet dir PARTITIONED BY cluster (at scale, probing is
        partition pruning on this table), plus centroids in the
        manifest. Readers pick up the new version on next query — the
        double-buffer swap without mutexes."""
        f = self.schema.get(field)
        if f is None or not f.field_type.is_dense_vector:
            raise VectorDBError(
                "INVALID_PAYLOAD", f"Field {field} is not a dense vector field."
            )
        itype = index_type.upper()
        if itype not in ("IVF", "IVF_SQ8", "IVF_PQ"):
            raise VectorDBError(
                "NOT_IMPLEMENTED_ERROR", f"Index type {index_type} not supported."
            )
        if itype == "IVF_PQ" and (f.metric or "EUCLIDEAN") == "DOT_PRODUCT":
            # ADC approximates L2; COSINE is stored normalized (L2
            # order == cosine order) but raw dot has no such bridge
            raise VectorDBError(
                "NOT_IMPLEMENTED_ERROR",
                "IVF_PQ ranks candidates by L2 ADC; use IVF or IVF_SQ8 "
                "for DOT_PRODUCT fields.",
            )
        from vectordb_spark.operators.ann import IVFIndex

        if train not in ("kmeans", "lloyd"):
            raise VectorDBError(
                "INVALID_PAYLOAD", f"Unknown trainer {train!r}; use kmeans|lloyd."
            )
        if (train_mod is not None or train_keep is not None) and train != "lloyd":
            raise VectorDBError(
                "INVALID_PAYLOAD",
                "train_mod/train_keep apply to the lloyd trainer only "
                "(the kmeans path already samples internally).",
            )
        meta = self._load_meta()
        df = self.df()
        idx = IVFIndex(k=k, seed=seed, metric=f.metric or "EUCLIDEAN")
        if train == "lloyd":
            # deterministic seeded-Lloyd trainer: same Lloyd iterations
            # as kmeans but bit-replayable (integer-grid means, fold
            # distances) — the trained path a SQL oracle can audit,
            # persisted in the manifest exactly like the MLlib path
            assigned = idx.build_lloyd(
                df.select("_row_id", field), field, rounds=rounds,
                train_mod=train_mod, train_keep=train_keep,
            )
        else:
            assigned = idx.build(df.select("_row_id", field), field)
        if itype == "IVF_SQ8":
            # store int8 codes + per-row scale + exact squared norm, NOT
            # the float vectors: the probe-scan reads 1 byte/dim instead
            # of 4 — the 4× bandwidth saving is physical, not notional.
            # Exact distances come from re-joining the base table for
            # the (small) re-rank candidate set only.
            from vectordb_spark.functions.distance import dot_product
            from vectordb_spark.operators.quant import (
                quant_scale_exprs,
                quantize_exprs,
            )

            scale_s, _ = quant_scale_exprs(field)
            qz_s, _ = quantize_exprs(field, "_scale")
            assigned = (
                assigned.withColumn("_scale", F.expr(scale_s))
                .withColumn("_q", F.expr(qz_s).cast("array<tinyint>"))
                .withColumn(
                    "_norm2", dot_product(F.col(field), F.col(field))
                )
                .select("_row_id", "_scale", "_q", "_norm2", "_cluster")
            )
        pq_codebook = None
        if itype == "IVF_PQ":
            # coarse quantizer (_cluster) for pruning + fine quantizer
            # (PQ codes, 4 bytes/row at M=8×K=16) for ranking: the
            # probe-scan reads M nibbles/row instead of 4·dim bytes;
            # float vectors are touched only for the re-rank candidates.
            # Codes are RESIDUAL-encoded (vec − assigned centroid):
            # raw-vector codes collapse inside tight clusters — every
            # member shares a code and ADC cannot rank within the blob
            # (SCALING.md "residual encoding is load-bearing": 3,125-way
            # ADC ties, recall 0; residual 0.91 at the same budget)
            from vectordb_spark.operators.pq import ResidualPQIndex

            # M must divide the dimension (each subspace = dim/M
            # contiguous components); largest of 8/4/2/1 that does
            m_sub = next(m for m in (8, 4, 2, 1) if (f.dimension or 0) % m == 0)
            pqi = ResidualPQIndex(m=m_sub, seed=seed)
            if train == "lloyd":
                # the bit-replayable trainer for BOTH tiers: coarse
                # cells came from build_lloyd above, the fine codebook
                # now trains on the same seeded-Lloyd discipline — a
                # SQL oracle can audit the full trained IVF_PQ
                # lifecycle (queries/ann.py table_ivfpq_trained_search)
                pqi.fit_residual_lloyd(
                    idx, assigned, field, rounds=rounds, id_col="_row_id",
                    train_mod=train_mod, train_keep=train_keep,
                )
            else:
                pqi.fit_residual(idx, assigned, field, id_col="_row_id")
            pq_codebook = pqi.codebook
            assigned = pqi.codes_residual(assigned, field).select(
                "_row_id", "_pq_codes", "_cluster"
            )
        version = meta.get("indexes", {}).get(field, {}).get("version", 0) + 1
        name = f"index_{field}_v{version}"
        (
            assigned.write.mode("overwrite")
            .partitionBy("_cluster")
            .parquet(os.path.join(self.path, name))
        )
        indexed_up_to = meta["next_row_id"]
        meta.setdefault("indexes", {})[field] = {
            "type": itype,
            "k": k,
            "seed": seed,
            "train": train,
            "rounds": rounds if train == "lloyd" else None,
            # sampled-trainer hash filter (None = full-corpus training);
            # recorded so a rebuilt-from-manifest audit can replay the
            # exact training subset
            "train_mod": train_mod if train == "lloyd" else None,
            "train_keep": train_keep if train == "lloyd" else None,
            "version": version,
            "dir": name,
            "deltas": [],
            "metric": f.metric or "EUCLIDEAN",
            "centroids": idx.centroids,
            "cluster_sizes": {str(c): n for c, n in (idx.cluster_sizes or {}).items()},
            "indexed_up_to": indexed_up_to,
            "mutation_seq": int(meta.get("mutation_seq", 0)),
            "pq_codebook": pq_codebook,
            # residual-encoded codes (build ≥ r7); absent/False in
            # older manifests → the raw-code search path still serves
            "pq_residual": itype == "IVF_PQ",
            # arithmetic convention the residual grid was encoded
            # under — refresh_index refuses to mix conventions
            "pq_residual_convention": (
                _PQ_RESIDUAL_CONVENTION if itype == "IVF_PQ" else None
            ),
            # separation statistics → the exact-fallback planner rule
            # applies to persisted-index searches too (None = +inf)
            "mean_intra_radius": idx.mean_intra_radius,
            "mean_nn_centroid_dist": (
                None
                if idx.mean_nn_centroid_dist is None
                or math.isinf(idx.mean_nn_centroid_dist)
                else idx.mean_nn_centroid_dist
            ),
        }
        self._save_meta(meta)
        return {"field": field, "version": version, "indexedRecords": indexed_up_to}

    def _residual_probe_matches(
        self, info: dict, field: str, sample: int = 256
    ) -> bool:
        """Convention probe for UNTAGGED residual IVF_PQ manifests:
        re-encode up to ``sample`` already-indexed live rows under the
        CURRENT residual convention (their stored ``_cluster`` pins the
        original coarse assignment) and compare byte-for-byte with the
        stored codes. True ⇒ the base was encoded under the current
        convention and refresh may append deltas; False (any mismatch,
        or no index row still live to verify against) ⇒ ambiguity
        stands and the caller rejects. One bounded read — the cost of
        never guessing about persisted bytes.

        The sample must be SPREAD, not the first row-group (ADVICE
        r10): a bare ``.limit`` returns one segment/cluster's rows,
        and a convention that differs only on rare inputs (grid
        half-boundary rounding, clamping at extremes — exactly the
        class a convention tag guards against) can agree byte-for-byte
        on that correlated slice while other stored codes differ. So:
        an index at or under ``full_check_max`` rows is verified IN
        FULL (codes are 4-byte rows — 64k of them is a trivial read);
        a larger one samples ``sample`` rows by smallest
        ``xxhash64(_row_id)``, a uniform spread across clusters and
        segments. Adoption on the sampled path is still probabilistic
        — a convention divergence confined to rows outside the spread
        sample would be missed — which is why the tag this probe
        writes is the one-time bridge for pre-tag manifests, not the
        ongoing integrity mechanism (new builds persist the tag at
        build time)."""
        from vectordb_spark.operators.pq import ResidualPQIndex

        full_check_max = 65536
        stored = self.spark.read.parquet(
            os.path.join(self.path, info["dir"])
        ).select(
            "_row_id",
            F.col("_pq_codes").cast("array<int>").alias("_stored"),
            F.col("_cluster").cast("int").alias("_cluster"),
        )
        n_index = sum(int(v) for v in (info.get("cluster_sizes") or {}).values())
        if n_index > full_check_max:
            stored = stored.orderBy(
                F.xxhash64(F.col("_row_id")).asc(), F.col("_row_id").asc()
            ).limit(sample)
        live = self.df().select("_row_id", field)
        joined = stored.join(live, "_row_id")
        rpqi = ResidualPQIndex(m=len(info["pq_codebook"]))
        rpqi.codebook = info["pq_codebook"]
        rpqi.coarse_centroids = info["centroids"]
        recoded = rpqi.codes_residual(joined, field, out_col="_now")
        n_checked, n_equal = recoded.agg(
            F.count(F.lit(1)),
            F.sum(
                (F.col("_now").cast("array<int>") == F.col("_stored"))
                .cast("int")
            ),
        ).first()
        return int(n_checked or 0) > 0 and int(n_equal or 0) == int(n_checked)

    def _tail_df(self, up_to: int, meta: dict | None = None) -> "DataFrame":
        """Rows inserted since ``up_to`` with SEGMENT PRUNING from the
        manifest's ``_row_id`` min/max (recorded at write time, r12):
        segments wholly below the watermark never enter the plan, so a
        refresh reads the TAIL, not the table — the property the
        delta-refresh discipline exists for. Conservative: missing
        stats keep the segment, and the watermark filter is always
        applied to the surviving rows. Callers that already hold a
        manifest snapshot pass it so the tail and the rest of their
        plan read the SAME version (no re-load, no snapshot drift
        under concurrent writers)."""
        from vectordb_spark.expr.prune import segment_overlaps

        if meta is None:
            meta = self._load_meta()
        files = list(meta["files"])
        stats = meta.get("segment_stats") or {}
        bounds = {"_row_id": (float(up_to), None)}
        keep = [f for f in files if segment_overlaps(stats.get(f), bounds)]
        return self._df_for_files(keep).where(F.col("_row_id") >= up_to)

    def refresh_index(self, field: str) -> dict:
        """Incremental ANN-index refresh: rows inserted since the last
        build/refresh self-assign to the STORED centroids (codegen
        argmin — k inline distances, no refit, no shuffle), get their
        stored codes (SQ8 quantization / PQ encoding against the stored
        codebook — both stateless given the manifest), and land in a
        new immutable delta dir partitioned by ``_cluster``; the
        manifest extends cluster sizes and advances ``indexed_up_to``
        in one CAS commit. A growing table keeps probe-pruned searches
        without per-query tail scans and without re-running KMeans —
        centroids and the separation-planner statistics stay
        build-time until a full ``rebuild`` (the text index's delta
        discipline, applied to vectors; the reference rebuilds from
        scratch each cycle, table_mvp.cpp:94-203)."""
        from vectordb_spark.functions.distance import l2_squared, vector_literal

        meta = self._load_meta()
        info = meta.get("indexes", {}).get(field)
        if info is None:
            raise VectorDBError(
                "NOT_IMPLEMENTED_ERROR",
                f"No index on field {field}; call rebuild first.",
            )
        up_to = int(info["indexed_up_to"])
        if up_to >= int(meta["next_row_id"]):
            return {"field": field, "version": info["version"], "appendedRecords": 0}
        tail = self._tail_df(up_to, meta).select("_row_id", field)
        dists = F.array(
            *[
                l2_squared(F.col(field), vector_literal(c))
                for c in info["centroids"]
            ]
        )
        assigned = tail.withColumn(
            "_cluster",
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
        )
        if info.get("type") == "IVF_SQ8":
            from vectordb_spark.functions.distance import dot_product
            from vectordb_spark.operators.quant import (
                quant_scale_exprs,
                quantize_exprs,
            )

            scale_s, _ = quant_scale_exprs(field)
            qz_s, _ = quantize_exprs(field, "_scale")
            assigned = (
                assigned.withColumn("_scale", F.expr(scale_s))
                .withColumn("_q", F.expr(qz_s).cast("array<tinyint>"))
                .withColumn("_norm2", dot_product(F.col(field), F.col(field)))
                .select("_row_id", "_scale", "_q", "_norm2", "_cluster")
            )
        elif info.get("type") == "IVF_PQ":
            from vectordb_spark.operators.pq import PQIndex, ResidualPQIndex

            if info.get("pq_residual"):
                # Mixing residual-arithmetic conventions inside one
                # index silently skews recall (delta codes land in
                # different grid cells than the base codebook was
                # trained on) — refuse and demand a full rebuild.
                # An UNTAGGED manifest (built before the tag existed)
                # is ambiguous, not necessarily wrong: probe it by
                # re-encoding a sample of already-indexed rows under
                # the current convention and comparing to their STORED
                # codes — bytes don't lie. Match ⇒ adopt the tag (it
                # persists with this refresh's manifest commit);
                # mismatch or nothing verifiable ⇒ reject as before.
                conv = info.get("pq_residual_convention")
                if conv is None and self._residual_probe_matches(info, field):
                    conv = _PQ_RESIDUAL_CONVENTION
                    info["pq_residual_convention"] = conv
                if conv != _PQ_RESIDUAL_CONVENTION:
                    raise VectorDBError(
                        "INDEX_CONVENTION_MISMATCH",
                        f"IVF_PQ index on {field!r} was built under "
                        f"residual convention {conv!r} but this engine "
                        f"encodes {_PQ_RESIDUAL_CONVENTION!r}; delta "
                        "codes would not be comparable to the stored "
                        "base codes. Run rebuild() to re-encode.",
                    )
                rpqi = ResidualPQIndex(m=len(info["pq_codebook"]))
                rpqi.codebook = info["pq_codebook"]
                rpqi.coarse_centroids = info["centroids"]
                assigned = rpqi.codes_residual(assigned, field).select(
                    "_row_id", "_pq_codes", "_cluster"
                )
            else:  # pre-residual manifest: keep its raw encoding
                pqi = PQIndex(m=len(info["pq_codebook"]))
                pqi.codebook = info["pq_codebook"]
                assigned = pqi.codes(assigned, field).select(
                    "_row_id", "_pq_codes", "_cluster"
                )
        else:
            assigned = assigned.select("_row_id", field, "_cluster")
        deltas = list(info.get("deltas", []))
        name = f"{info['dir']}_delta{len(deltas) + 1}"
        assigned = assigned.localCheckpoint()  # one compute: write + sizes
        assigned.write.partitionBy("_cluster").parquet(
            os.path.join(self.path, name)
        )
        delta_sizes = {
            str(r["_cluster"]): int(r["n"])
            for r in assigned.groupBy("_cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        appended = sum(delta_sizes.values())
        sizes = dict(info.get("cluster_sizes") or {})
        for c, n in delta_sizes.items():
            sizes[c] = int(sizes.get(c, 0)) + n
        info["cluster_sizes"] = sizes
        info["deltas"] = deltas + [name]
        info["indexed_up_to"] = meta["next_row_id"]
        self._save_meta(meta)
        return {
            "field": field,
            "version": info["version"],
            "appendedRecords": appended,
        }

    def search_indexed_df(
        self,
        query_vector,
        *,
        query_field: str | None = None,
        limit: int,
        nprobe: int | None = None,
        filter: str = "",
    ) -> DataFrame:
        """ANN search via the IVF index + brute-forced unindexed tail —
        the reference's hybrid indexed+tail search (T5,
        vec_search_executor.cpp:885-914): graph/index over rows present
        at build time, exact scan over rows inserted since, merged
        top-K. Index candidates come from the probed cluster partitions
        only; ``nprobe=None`` auto-plans the probe list from stored
        cluster sizes (probe until ~32·limit candidates or 25% of the
        table), an int pins it."""
        from vectordb_spark.operators.ann import IVFIndex

        f = self._resolve_query_field(query_field, None)
        meta = self._load_meta()
        info = meta.get("indexes", {}).get(f.name)
        if info is None:
            return self.search_df(
                query_vector, query_field=f.name, limit=limit, filter=filter
            )
        idx = IVFIndex(k=info["k"], seed=info["seed"], metric=info["metric"])
        idx.centroids = info["centroids"]
        idx.cluster_sizes = {
            int(c): int(n) for c, n in (info.get("cluster_sizes") or {}).items()
        }
        idx.mean_intra_radius = info.get("mean_intra_radius")
        nn = info.get("mean_nn_centroid_dist")
        idx.mean_nn_centroid_dist = float("inf") if nn is None else float(nn)
        q = _normalize_dense_query(query_vector, f)
        if nprobe is None:
            # the separation planner rule (operators/ann.py): when the
            # build-time stats say probing can't carry recall, answer
            # exactly — same fallback the operator-level search applies.
            # An IVF_PQ index keeps its stored-code advantage instead:
            # rank ALL clusters by ADC over the 4-byte codes + exact
            # re-rank (clusters=None drops the probe filter below)
            if idx.separation_ratio < idx.SEPARATION_EXACT_FALLBACK:
                if info.get("type") != "IVF_PQ":
                    return self.search_df(
                        query_vector, query_field=f.name, limit=limit, filter=filter
                    )
                clusters = None
            else:
                clusters = idx.plan_probes(q, limit)
        else:
            clusters = idx.probe_clusters(q, nprobe)
        # main dir + refresh deltas, each its own cluster-partitioned
        # root: probe pruning (PartitionFilters on _cluster) applies
        # per dir, then the candidate streams union
        from functools import reduce

        probed = reduce(
            lambda a, b: a.unionByName(b),
            (
                (
                    d if clusters is None
                    else d.where(F.col("_cluster").isin(clusters))
                )
                for d in (
                    self.spark.read.parquet(os.path.join(self.path, p))
                    for p in [info["dir"], *info.get("deltas", [])]
                )
            ),
        )
        base = self.df()
        # unchanged manifest mutation_seq ⇒ no deletes/upserts since
        # the build ⇒ the index holds no dead ids and the semi-join
        # (a full base scan + shuffle per search) is skipped
        clean = info.get("mutation_seq") == meta.get("mutation_seq", 0)
        if info.get("type") == "IVF_SQ8":
            # the index may hold ids for rows deleted/upserted since the
            # build; drop them BEFORE the refine cut, or a delete-heavy
            # table would fill the candidate budget with dead ids
            if not clean:
                probed = probed.join(
                    base.select("_row_id"), "_row_id", "left_semi"
                )
            # quantized probe-scan: rank the probed codes by the int8
            # approximation, keep refine·limit candidate ids — the scan
            # reads codes (1 B/dim), never float vectors; exact
            # distances happen below on the candidate join only
            from vectordb_spark.operators.quant import (
                int_dot_exprs,
                quantize_vector,
            )

            q_codes, q_scale = quantize_vector(q)
            dot_s, _ = int_dot_exprs("_q", q_codes)
            approx_dot = F.expr(dot_s) * F.col("_scale") * F.lit(q_scale)
            metric = info["metric"]
            if metric == "EUCLIDEAN":
                qnorm2 = float(sum(float(x) * float(x) for x in q))
                approx_dist = F.col("_norm2") - 2.0 * approx_dot + F.lit(qnorm2)
            elif metric == "COSINE":  # ingest-normalized: cos ≡ dot
                approx_dist = F.lit(1.0) - approx_dot
            else:  # DOT_PRODUCT: distance = -dot
                approx_dist = -approx_dot
            refine = max(4 * limit, 50)
            probed = (
                probed.withColumn("_approx", approx_dist)
                .orderBy(F.col("_approx").asc(), F.col("_row_id").asc())
                .limit(refine)
            )
        elif info.get("type") == "IVF_PQ":
            # ADC over stored codes (M integer table lookups/row) ranks
            # the probed — or, in the fallback, ALL — rows; exact
            # re-rank happens on the candidate join below. Same
            # dead-id discipline as SQ8.
            from vectordb_spark.operators.pq import (
                adc_from_codes_expr,
                adc_table,
                quantize_query,
            )

            if not clean:
                probed = probed.join(
                    base.select("_row_id"), "_row_id", "left_semi"
                )
            refine = max(4 * limit, 64)
            if clusters is None:
                # whole-index ADC fallback (unclusterable corpus):
                # refine scales to 2% of the indexed rows — a fixed
                # budget collapses recall when 4-bit ADC ranks
                # distance-concentrated data (see operators/ann.py)
                refine = max(refine, 16 * limit, info["indexed_up_to"] // 50)
            if info.get("pq_residual"):
                # per-cluster ADC: each probed cell ranks its codes
                # against ITS residual query (q − centroid_c); residual
                # ADC values approximate the same true L2 across cells,
                # so one global refine cut stays rank-correct
                cents = info["centroids"]
                cl_list = (
                    clusters if clusters is not None
                    else list(range(len(cents)))
                )
                approx = F.lit(None).cast("long")
                for c in cl_list:
                    res_q = [
                        float(a) - float(b) for a, b in zip(q, cents[c])
                    ]
                    tab = adc_table(
                        info["pq_codebook"], quantize_query(res_q)
                    )
                    approx = F.when(
                        F.col("_cluster") == int(c),
                        F.expr(adc_from_codes_expr("_pq_codes", tab)),
                    ).otherwise(approx)
            else:  # pre-residual manifest: one global table
                table = adc_table(info["pq_codebook"], quantize_query(q))
                approx = F.expr(adc_from_codes_expr("_pq_codes", table))
            probed = (
                probed.withColumn("_approx", approx)
                .orderBy(F.col("_approx").asc(), F.col("_row_id").asc())
                .limit(refine)
            )
        cand_ids = probed.select("_row_id")
        candidates = base.join(cand_ids, "_row_id", "left_semi")
        if int(info["indexed_up_to"]) < int(meta["next_row_id"]):
            # segment-pruned tail (r12): only post-build segments scan
            candidates = candidates.unionByName(
                self._tail_df(int(info["indexed_up_to"]), meta)
            ).dropDuplicates(["_row_id"])
        ast = parse_filter(filter, self.field_map())
        qcol = F.array(*[F.lit(float(x)) for x in q])
        dist = distance_for_metric(info["metric"], F.col(f.name), qcol)
        out = candidates
        post = ast is not None and references_distance(ast)
        if ast is not None and not post:
            out = out.where(to_spark_column(ast))
        out = out.withColumn("_distance", dist)
        if post:
            out = out.where(to_spark_column(ast))
        return out.orderBy(F.col("_distance").asc(), F.col("_row_id").asc()).limit(limit)

    def search_clustered_df(
        self,
        query_vector,
        *,
        query_field: str | None = None,
        limit: int,
        nprobe: int | None = None,
        filter: str = "",
    ) -> DataFrame:
        """Probe search over a cluster-compacted BASE table
        (``compact(cluster_by=...)``): the probe list is a
        partition-pruning predicate on the base scan itself
        (PartitionFilters on ``_cluster`` — whole directories skipped
        at file-listing time), with no index dir and no candidate
        join-back. Segments appended since the clustered compact carry
        write-time assignments (``_write_segment``), so there is no
        unindexed tail to merge either. Falls back to exact search when
        the table has no cluster layout for the field, or when the
        stored separation statistics reject probing (same planner rule
        as ``search_indexed_df``)."""
        f = self._resolve_query_field(query_field, None)
        meta = self._load_meta()
        idx = self._cluster_layout_index(meta)
        if idx is None or meta.get("cluster_layout", {}).get("field") != f.name:
            return self.search_df(
                query_vector, query_field=f.name, limit=limit, filter=filter
            )
        q = _normalize_dense_query(query_vector, f)
        if nprobe is None:
            if idx.separation_ratio < idx.SEPARATION_EXACT_FALLBACK:
                return self.search_df(
                    query_vector, query_field=f.name, limit=limit, filter=filter
                )
            clusters = idx.plan_probes(q, limit)
        else:
            clusters = idx.probe_clusters(q, nprobe)
        out = self.df().where(
            F.col("_cluster").isin([int(c) for c in clusters])
        )
        ast = parse_filter(filter, self.field_map())
        qcol = F.array(*[F.lit(float(x)) for x in q])
        dist = distance_for_metric(idx.metric, F.col(f.name), qcol)
        post = ast is not None and references_distance(ast)
        if ast is not None and not post:
            out = out.where(to_spark_column(ast))
        out = out.withColumn("_distance", dist)
        if post:
            out = out.where(to_spark_column(ast))
        return (
            out.orderBy(F.col("_distance").asc(), F.col("_row_id").asc())
            .limit(limit)
            .drop("_cluster")
        )

    def rebuild_text_index(self, field: str, *, buckets: int = 64) -> dict:
        """Batch (re)build of a persisted INVERTED INDEX over a STRING
        field — the lexical sibling of ``rebuild`` (same versioned-dir
        double-buffer swap, X3/table_mvp.cpp:94-203): posting rows
        (token, _row_id, tf, dl) land in a parquet dir PARTITIONED BY
        ``_tb = pmod(xxhash64(token), buckets)``, so a query's terms
        prune to |terms|/buckets of the index at file-listing time —
        the lexical analog of IVF probe pruning. Corpus stats (N docs,
        Σ doc lengths) are recorded in the manifest; ``indexed_up_to``
        marks the unindexed tail for hybrid indexed+tail search, the
        same T5 discipline as the vector index.

        Whitespace tokenization matches the query-layer BM25
        (queries/fusion.py) so indexed search reproduces the corpus
        scan bit-for-bit. At 100 TB you'd raise ``buckets`` (and write
        more files per bucket — the repartition key below); 64 keeps
        local test layouts small."""
        f = self.schema.get(field)
        if f is None or f.field_type not in (FieldType.STRING,):
            raise VectorDBError(
                "INVALID_PAYLOAD", f"Field {field} is not a STRING field."
            )
        meta = self._load_meta()
        version = (
            meta.get("text_indexes", {}).get(field, {}).get("version", 0) + 1
        )
        name = f"textindex_{field}_v{version}"
        n_docs, sum_dl = self._write_text_postings(
            self.df(), field, buckets, name
        )
        meta.setdefault("text_indexes", {})[field] = {
            "version": version,
            "dir": name,
            "deltas": [],
            "buckets": buckets,
            "n_docs": n_docs,
            "sum_dl": sum_dl,
            "indexed_up_to": meta["next_row_id"],
            "mutation_seq": int(meta.get("mutation_seq", 0)),
        }
        self._save_meta(meta)
        return {
            "field": field,
            "version": version,
            "indexedRecords": n_docs,
        }

    def _write_text_postings(
        self, df: DataFrame, field: str, buckets: int, name: str
    ) -> tuple[int, int]:
        """One explode → groupBy pass over ``df``'s text, written as a
        bucket-partitioned posting dir; returns (doc count, Σ doc
        lengths) for the manifest stats. Postings are POSITIONAL
        (sorted 1-based ``_pos`` array per (doc, token)) so phrase
        queries resolve from the index alone — the Lucene
        positions-in-postings layout."""
        words = F.split(F.col(field), " ", -1)
        postings = (
            df.select(
                "_row_id",
                F.size(words).cast("long").alias("_dl"),
                F.posexplode(words).alias("_p0", "_token"),
            )
            .groupBy("_row_id", "_dl", "_token")
            .agg(
                F.count(F.lit(1)).alias("_tf"),
                F.sort_array(F.collect_list(F.col("_p0") + 1)).alias("_pos"),
            )
            .withColumn(
                "_tb", F.pmod(F.xxhash64("_token"), F.lit(buckets)).cast("int")
            )
        )
        n_docs, sum_dl = df.select(
            F.count(F.lit(1)), F.sum(F.size(words)).cast("long")
        ).first()
        (
            # shuffle key (_tb, row-hash): plain _tb would funnel each
            # bucket — and with zipfian tokens, the hot bucket holds a
            # large corpus fraction — through ONE writer task. The
            # row-hash salt splits every bucket across 4 writers (4
            # files/bucket dir) while partitionBy still lays out one
            # directory per bucket for file-listing pruning.
            postings.repartition(
                F.col("_tb"), F.pmod(F.xxhash64("_row_id"), F.lit(4))
            )
            .write.mode("overwrite")
            .partitionBy("_tb")
            .parquet(os.path.join(self.path, name))
        )
        return int(n_docs or 0), int(sum_dl or 0)

    def refresh_text_index(self, field: str) -> dict:
        """Incremental index refresh: postings for ONLY the unindexed
        tail (rows inserted since the last build/refresh) land in a new
        immutable DELTA dir alongside the main index — same bucket
        partitioning, so query-term pruning applies per dir — and the
        manifest extends (N, Σdl) and advances ``indexed_up_to``
        atomically (CAS commit). A growing table never pays a full
        rebuild just to keep search off the live-tail scan path: the
        Lucene segment-commit discipline, with the manifest as the
        segments file. Deletes are untouched — dead postings in older
        dirs stay handled by the mutation_seq semi-join until a full
        ``rebuild_text_index`` resets the baseline (= Lucene merge)."""
        meta = self._load_meta()
        info = meta.get("text_indexes", {}).get(field)
        if info is None:
            raise VectorDBError(
                "NOT_IMPLEMENTED_ERROR",
                f"No text index on field {field}; call rebuild_text_index first.",
            )
        up_to = int(info["indexed_up_to"])
        if up_to >= int(meta["next_row_id"]):
            return {"field": field, "version": info["version"], "appendedRecords": 0}
        tail = self._tail_df(up_to, meta)
        deltas = list(info.get("deltas", []))
        name = f"{info['dir']}_delta{len(deltas) + 1}"
        n_docs, sum_dl = self._write_text_postings(
            tail, field, int(info["buckets"]), name
        )
        info["deltas"] = deltas + [name]
        info["n_docs"] = int(info["n_docs"]) + n_docs
        info["sum_dl"] = int(info["sum_dl"]) + sum_dl
        info["indexed_up_to"] = meta["next_row_id"]
        self._save_meta(meta)
        return {
            "field": field,
            "version": info["version"],
            "appendedRecords": n_docs,
        }

    def _text_postings(self, df: DataFrame, field: str, terms: list[str]) -> DataFrame:
        """(_row_id, _dl, _token, _tf, _pos) for query terms, computed
        directly from text — the unindexed-tail scoring path."""
        words = F.split(F.col(field), " ", -1)
        return (
            df.select(
                "_row_id",
                F.size(words).cast("long").alias("_dl"),
                F.posexplode(words).alias("_p0", "_token"),
            )
            .where(F.col("_token").isin(*terms))
            .groupBy("_row_id", "_dl", "_token")
            .agg(
                F.count(F.lit(1)).alias("_tf"),
                F.sort_array(F.collect_list(F.col("_p0") + 1)).alias("_pos"),
            )
        )

    def search_text_df(
        self,
        query_text: str,
        *,
        query_field: str | None = None,
        limit: int = 10,
        filter: str = "",
        phrase: bool = False,
    ) -> DataFrame:
        """BM25 search through the persisted inverted index, merged
        with a direct scan of the unindexed tail (rows inserted since
        the build — T5's hybrid indexed+tail shape). The index scan
        prunes to the query terms' hash buckets (PartitionFilters on
        ``_tb``) and pushes the term filter into the posting scan; per-
        term document frequencies come from the pruned postings + tail
        (exact), while the corpus stats (N, Σdl) ride from the manifest
        plus a tail aggregate — one composed plan, no driver actions.
        Scores are the quantized-grid BM25 of functions.text_rank, so
        indexed results hash-match the corpus-scan query exactly.
        Returns base-table rows (``filter`` applied as a pre-filter
        semi-join on candidates) with ``_score`` / ``_terms``.

        ``phrase=True`` treats the query as an EXACT PHRASE: the
        positional postings resolve adjacency (a start-position chain
        intersected term by term, the Lucene exact-phrase algorithm),
        the phrase acts as one pseudo-term (tf = overlapping phrase
        occurrences, df = docs containing the phrase), and ranking is
        the same quantized BM25 — all from the pruned index, the raw
        text is never re-read."""
        from vectordb_spark.functions.text_rank import bm25_sq_expr

        meta = self._load_meta()
        tidx = meta.get("text_indexes", {})
        field = query_field or next(iter(tidx), None)
        info = tidx.get(field) if field else None
        if info is None:
            raise VectorDBError(
                "NOT_IMPLEMENTED_ERROR",
                f"No text index on field {field or '<none>'}; "
                "call rebuild_text_index first.",
            )
        seq_terms = [t for t in query_text.split(" ") if t]
        terms = sorted(set(seq_terms))
        if not terms:
            raise VectorDBError("INVALID_PAYLOAD", "Empty query text.")
        spark = self.spark
        buckets = int(info["buckets"])
        # term → bucket via the driver-side XXH64 mirror of the JVM
        # xxhash64 the build used (functions/hashing.py) — no Spark
        # job for a handful of strings
        from vectordb_spark.functions.hashing import pmod_bucket

        tbs = [pmod_bucket(t, buckets) for t in terms]
        # main dir + refresh deltas: each is its own bucket-partitioned
        # root, read with the same (_tb PartitionFilter, _token
        # predicate) pruning and unioned — the Lucene multi-segment read
        from functools import reduce

        idx = reduce(
            lambda a, b: a.unionByName(b),
            (
                spark.read.parquet(os.path.join(self.path, d))
                .where(
                    F.col("_tb").isin(sorted(set(tbs)))
                    & F.col("_token").isin(*terms)
                )
                .select(
                    "_row_id", "_dl", "_token", "_tf",
                    *(["_pos"] if phrase else []),
                )
                for d in [info["dir"], *info.get("deltas", [])]
            ),
        )
        base = self.df()
        up_to = int(info["indexed_up_to"])
        has_tail = up_to < int(meta["next_row_id"])
        # dead-id discipline (same as the SQ8/PQ vector paths): the
        # index may hold postings for rows deleted since the build —
        # drop them before df counting and the top-k cut. Corpus stats
        # (N, Σdl) stay build-time until rebuild — the Lucene
        # convention for deleted docs (slightly stale idf, never
        # wrong candidates). The manifest mutation_seq tells us when
        # this is NECESSARY: unchanged seq ⇒ no deletes since the
        # build ⇒ skip the semi-join (a full base scan + shuffle)
        # entirely; likewise an unmoved row-id cursor skips both tail
        # scans. The clean-index fast path therefore touches only the
        # pruned postings + the top-k row fetch.
        clean = info.get("mutation_seq") == meta.get("mutation_seq", 0)
        if not clean:
            idx = idx.join(base.select("_row_id"), "_row_id", "left_semi")
        postings = idx
        if has_tail:
            # segment-pruned tail (r12): only post-build segments scan
            tail = self._tail_df(up_to, meta)
            tail_postings = self._text_postings(tail, field, terms)
            if not phrase:
                tail_postings = tail_postings.drop("_pos")
            postings = postings.unionByName(tail_postings)
        # candidate pre-filter (reference semantics: filter before rank)
        ast = parse_filter(filter, self.field_map())
        if ast is not None:
            allowed = base.where(to_spark_column(ast)).select("_row_id")
            postings = postings.join(allowed, "_row_id", "left_semi")
        if phrase:
            # Lucene exact-phrase over positional postings: pivot the
            # query terms' position lists per doc, intersect the
            # start-position chain term by term (start p is valid iff
            # term_i sits at p+i for every i; overlapping matches
            # count), and collapse the phrase into ONE pseudo-term
            # whose tf is the surviving start count. df/ranking then
            # flow through the ordinary BM25 machinery unchanged.
            perdoc = (
                postings.groupBy("_row_id", "_dl")
                .agg(
                    F.map_from_entries(
                        F.collect_list(F.struct("_token", "_pos"))
                    ).alias("_m"),
                    F.count(F.lit(1)).alias("_nt"),
                )
                .where(F.col("_nt") == len(terms))  # has every term
            )
            starts = F.col("_m").getItem(seq_terms[0])
            for t in seq_terms[1:]:
                starts = F.array_intersect(
                    F.transform(starts, lambda p: p + 1),
                    F.col("_m").getItem(t),
                )
            postings = (
                perdoc.withColumn("_ptf", F.size(starts))
                .where(F.col("_ptf") > 0)
                .select(
                    "_row_id",
                    "_dl",
                    F.lit(" ".join(seq_terms)).alias("_token"),
                    F.col("_ptf").cast("long").alias("_tf"),
                )
            )
        dfreq = postings.groupBy("_token").agg(
            F.countDistinct("_row_id").alias("_df")
        )
        if has_tail:
            words = F.split(F.col(field), " ", -1)
            stats = (
                tail.select(
                    F.count(F.lit(1)).alias("_tn"),
                    F.coalesce(
                        F.sum(F.size(words)).cast("long"), F.lit(0)
                    ).alias("_ts"),
                )
                .select(
                    (F.col("_tn") + F.lit(int(info["n_docs"]))).alias("_n"),
                    (F.col("_ts") + F.lit(int(info["sum_dl"]))).alias("_s"),
                )
            )
        else:
            stats = spark.createDataFrame(
                [(int(info["n_docs"]), int(info["sum_dl"]))], "_n long, _s long"
            )
        scored = (
            postings.join(F.broadcast(dfreq), "_token")
            .crossJoin(F.broadcast(stats))
            .select(
                "_row_id",
                F.expr(bm25_sq_expr("_tf", "_df", "_dl", "_n", "_s")).alias(
                    "_sq"
                ),
            )
            .groupBy("_row_id")
            .agg(
                F.sum("_sq").cast("long").alias("_score"),
                F.count(F.lit(1)).alias("_terms"),
            )
            .orderBy(F.col("_score").desc(), F.col("_row_id"))
            .limit(limit)
        )
        if limit <= self._TEXT_FETCH_COLLECT_MAX:
            # Two-phase fetch (the doc-store point-read a real lexical
            # engine does): run the scoring plan — which on a clean
            # index touches ONLY the pruned postings — collect the
            # ≤limit (id, score) pairs, and re-read base with a
            # pushed-down _row_id IN filter so parquet row-group stats
            # prune the fetch. Without this the final join scans the
            # whole base to materialize k rows, wiping out the posting
            # pruning's advantage (measured: the fetch scan alone cost
            # as much as the entire corpus-scan BM25).
            top = scored.collect()
            if not top:
                return (
                    base.withColumn("_score", F.lit(0).cast("long"))
                    .withColumn("_terms", F.lit(0).cast("long"))
                    .limit(0)
                )
            hits = spark.createDataFrame(
                [(r["_row_id"], r["_score"], r["_terms"]) for r in top],
                "_row_id long, _score long, _terms long",
            )
            return (
                base.where(F.col("_row_id").isin([r["_row_id"] for r in top]))
                .join(F.broadcast(hits), "_row_id")
                .orderBy(F.col("_score").desc(), F.col("_row_id"))
            )
        # large limits (bulk consumers / the oracle gate's re-cut) keep
        # ONE composed plan — no driver materialization of a big top-k
        return (
            base.join(F.broadcast(scored), "_row_id")
            .orderBy(F.col("_score").desc(), F.col("_row_id"))
        )

    def rebuild_sparse_index(self, field: str, *, buckets: int = 64) -> dict:
        """Inverted index over a SPARSE vector field (the SPLADE-style
        retrieval layout): one posting row per nonzero (doc, dim),
        hive-partitioned by ``_db = dim % buckets`` so a query's
        nonzero dims prune the posting scan at file-listing time, plus
        a norms sidecar (_row_id, _norm2 — 16 B/row) that completes
        the candidate set for metrics where docs sharing NO dims can
        still rank (L2: small-norm docs; dot/cosine: the zero-overlap
        tie class). Searches are EXACT — the index only prunes; final
        scores come from the canonical sparse distance expression over
        the candidate rows (search_sparse_indexed_df)."""
        f = self.schema.get(field)
        if f is None or not f.field_type.is_sparse_vector:
            raise VectorDBError(
                "INVALID_PAYLOAD", f"Field {field} is not a sparse vector field."
            )
        from vectordb_spark.functions.distance import sparse_norm_sq

        meta = self._load_meta()
        version = (
            meta.get("sparse_indexes", {}).get(field, {}).get("version", 0) + 1
        )
        name = f"sparseindex_{field}_v{version}"
        df = self.df()
        self._write_sparse_postings(df, field, buckets, name)
        norms_name = f"{name}_norms"
        df.select(
            "_row_id", sparse_norm_sq(F.col(field)).alias("_norm2")
        ).write.mode("overwrite").parquet(os.path.join(self.path, norms_name))
        n = self._dir_count(norms_name)
        meta.setdefault("sparse_indexes", {})[field] = {
            "version": version,
            "dir": name,
            "norms_dir": norms_name,
            "buckets": buckets,
            "deltas": [],
            "norms_deltas": [],
            "indexed_up_to": meta["next_row_id"],
            "mutation_seq": int(meta.get("mutation_seq", 0)),
        }
        self._save_meta(meta)
        return {"field": field, "version": version, "indexedRecords": n}

    def refresh_sparse_index(self, field: str) -> dict:
        """Incremental sparse-index refresh (r12 — the sparse twin of
        ``refresh_text_index``): postings and norms for ONLY the
        unindexed tail (rows inserted since the last build/refresh)
        land in new immutable DELTA dirs beside the main index — same
        ``_db`` bucket partitioning, so query-dim pruning applies per
        dir — and ``indexed_up_to`` advances atomically. A growing
        table never pays a full posting rebuild to keep search off the
        live-tail scan path. Deletes are untouched: dead postings in
        older dirs stay handled by the mutation_seq semi-join until a
        full ``rebuild_sparse_index`` resets the baseline (the Lucene
        segment-commit discipline)."""
        from vectordb_spark.functions.distance import sparse_norm_sq

        meta = self._load_meta()
        info = meta.get("sparse_indexes", {}).get(field)
        if info is None:
            raise VectorDBError(
                "NOT_IMPLEMENTED_ERROR",
                f"No sparse index on field {field}; call "
                "rebuild_sparse_index first.",
            )
        up_to = int(info["indexed_up_to"])
        if up_to >= int(meta["next_row_id"]):
            return {
                "field": field,
                "version": info["version"],
                "appendedRecords": 0,
            }
        tail = self._tail_df(up_to, meta)
        deltas = list(info.get("deltas", []))
        name = f"{info['dir']}_delta{len(deltas) + 1}"
        self._write_sparse_postings(tail, field, int(info["buckets"]), name)
        norms_name = f"{name}_norms"
        tail.select(
            "_row_id", sparse_norm_sq(F.col(field)).alias("_norm2")
        ).write.mode("overwrite").parquet(os.path.join(self.path, norms_name))
        n = self._dir_count(norms_name)
        info["deltas"] = deltas + [name]
        info["norms_deltas"] = list(info.get("norms_deltas", [])) + [
            norms_name
        ]
        info["indexed_up_to"] = meta["next_row_id"]
        self._save_meta(meta)
        return {
            "field": field,
            "version": info["version"],
            "appendedRecords": n,
        }

    def _write_sparse_postings(
        self, df: DataFrame, field: str, buckets: int, name: str
    ) -> None:
        v = F.col(field)
        postings = (
            df.select(
                "_row_id",
                F.explode(
                    F.arrays_zip(v.getField("indices"), v.getField("values"))
                ).alias("_z"),
            )
            .select(
                "_row_id",
                F.col("_z.indices").cast("long").alias("_dim"),
                F.col("_z.values").cast("double").alias("_val"),
            )
            .withColumn("_db", F.pmod(F.col("_dim"), F.lit(buckets)).cast("int"))
        )
        (
            # same zipf-skew salting as the text index: hot dims split
            # across 4 writers, one dir per bucket for pruning
            postings.repartition(
                F.col("_db"), F.pmod(F.xxhash64("_row_id"), F.lit(4))
            )
            .write.mode("overwrite")
            .partitionBy("_db")
            .parquet(os.path.join(self.path, name))
        )

    def search_sparse_indexed_df(
        self,
        query_vector,
        *,
        query_field: str | None = None,
        limit: int,
        filter: str = "",
    ) -> DataFrame:
        """EXACT sparse KNN through the inverted index. Candidates =
        (rows sharing ≥ 1 nonzero query dim — complete for any score
        contribution, read from the dim-pruned postings) ∪ (the top
        ``limit`` VOID rows that share nothing: for EUCLIDEAN the
        smallest ||x||² from the norms sidecar — a void doc scores
        ||x||²+||q||², so no doc outside this set can enter the top-k;
        for DOT/COSINE every void doc ties at 0 / 1.0, so the first
        ``limit`` by row-id tie-break suffice). The final ranking
        re-scores candidates with the canonical sparse distance — the
        index prunes, never approximates. Tail rows (inserted since
        the build) join both candidate streams via direct scans;
        dead ids drop via the mutation_seq semi-join when needed."""
        f = self._resolve_query_field(query_field, None)
        if not f.field_type.is_sparse_vector:
            raise VectorDBError(
                "INVALID_PAYLOAD", f"Field {f.name} is not a sparse vector field."
            )
        meta = self._load_meta()
        info = meta.get("sparse_indexes", {}).get(f.name)
        if info is None:
            return self.search_df(
                query_vector, query_field=f.name, limit=limit, filter=filter
            )
        q = _normalize_sparse_query(query_vector, f)
        dims = [int(i) for i in q["indices"]]
        buckets = int(info["buckets"])
        dbs = sorted({d % buckets for d in dims})
        spark = self.spark
        base = self.df()
        ast = parse_filter(filter, self.field_map())
        clean = info.get("mutation_seq") == meta.get("mutation_seq", 0)
        up_to = int(info["indexed_up_to"])
        has_tail = up_to < int(meta["next_row_id"])

        from functools import reduce as _reduce

        idx_ids = _reduce(
            DataFrame.unionByName,
            [
                spark.read.parquet(os.path.join(self.path, d))
                .where(F.col("_db").isin(dbs) & F.col("_dim").isin(dims))
                .select("_row_id")
                # main dir + refresh deltas (refresh_sparse_index):
                # each its own bucket-partitioned root, dim-pruned
                # independently — same layout, so per-dir hive reads
                # union cleanly
                for d in [info["dir"], *info.get("deltas", [])]
            ],
        )
        norms = _reduce(
            DataFrame.unionByName,
            [
                spark.read.parquet(os.path.join(self.path, d))
                for d in [
                    info["norms_dir"],
                    *info.get("norms_deltas", []),
                ]
            ],
        )
        if not clean:
            live = base.select("_row_id")
            idx_ids = idx_ids.join(live, "_row_id", "left_semi")
            norms = norms.join(live, "_row_id", "left_semi")
        if has_tail:
            from vectordb_spark.functions.distance import sparse_norm_sq

            # segment-pruned tail (r12): only post-build segments scan
            tail = self._tail_df(up_to, meta)
            v = F.col(f.name)
            tail_ids = tail.select(
                "_row_id", F.explode(v.getField("indices")).alias("_dim")
            ).where(F.col("_dim").cast("long").isin(dims)).select("_row_id")
            idx_ids = idx_ids.unionByName(tail_ids)
            norms = norms.unionByName(
                tail.select("_row_id", sparse_norm_sq(v).alias("_norm2"))
            )
        if ast is not None:
            allowed = base.where(to_spark_column(ast)).select("_row_id")
            idx_ids = idx_ids.join(allowed, "_row_id", "left_semi")
            norms = norms.join(allowed, "_row_id", "left_semi")
        sharing = idx_ids.distinct()
        void = norms.join(sharing, "_row_id", "left_anti")
        metric = (f.metric or "EUCLIDEAN").upper()
        if metric == "EUCLIDEAN":
            void = void.orderBy(F.col("_norm2").asc(), F.col("_row_id").asc())
        else:  # DOT_PRODUCT / COSINE: void docs tie; row-id order decides
            void = void.orderBy(F.col("_row_id").asc())
        cands = sharing.unionByName(
            void.limit(limit).select("_row_id")
        ).distinct()
        qcol = F.struct(
            F.array(*[F.lit(int(i)) for i in q["indices"]]).alias("indices"),
            F.array(*[F.lit(float(x)) for x in q["values"]])
            .cast("array<float>")
            .alias("values"),
        )
        scored = base.join(cands, "_row_id", "left_semi").withColumn(
            "_distance",
            sparse_distance_for_metric(f.metric or "EUCLIDEAN", F.col(f.name), qcol),
        )
        if ast is not None:
            scored = scored.where(to_spark_column(ast))
        return scored.orderBy(
            F.col("_distance").asc(), F.col("_row_id").asc()
        ).limit(limit)

    def search_text_multi_df(
        self,
        query_text: str,
        field_weights: dict[str, int],
        *,
        limit: int = 10,
        filter: str = "",
    ) -> DataFrame:
        """Weighted multi-field lexical search (the practical BM25F
        variant: per-field BM25 scores linearly combined — each field
        keeps its own length normalization and document frequencies,
        then INTEGER weights scale the quantized scores, so the
        combination stays exact BIGINT arithmetic). Every named field
        must carry a text index; a doc ranks by
        Σ_field weight · bm25_field(doc). Candidate docs match in ≥ 1
        field (absent fields contribute 0) — the multi-field search
        shape of Lucene's query-time field boosts."""
        if not field_weights:
            raise VectorDBError("INVALID_PAYLOAD", "field_weights is empty.")
        for w in field_weights.values():
            if not isinstance(w, int) or w <= 0:
                raise VectorDBError(
                    "INVALID_PAYLOAD",
                    "Field weights must be positive integers (the exact-"
                    "arithmetic discipline: integer-scaled BIGINT scores).",
                )
        parts = None
        for field, w in field_weights.items():
            p = self.search_text_df(
                query_text,
                query_field=field,
                limit=1 << 30,  # composed plan; the cut happens on the sum
                filter=filter,
            ).select(
                "_row_id",
                (F.col("_score") * F.lit(int(w))).alias("_ws"),
                F.col("_terms").alias("_t"),
            )
            parts = p if parts is None else parts.unionByName(p)
        combined = parts.groupBy("_row_id").agg(
            F.sum("_ws").cast("long").alias("_score"),
            F.sum("_t").cast("long").alias("_terms"),
        )
        top = (
            combined.orderBy(F.col("_score").desc(), F.col("_row_id"))
            .limit(limit)
            .collect()
        )
        if not top:
            return (
                self.df()
                .withColumn("_score", F.lit(0).cast("long"))
                .withColumn("_terms", F.lit(0).cast("long"))
                .limit(0)
            )
        hits = self.spark.createDataFrame(
            [(r["_row_id"], r["_score"], r["_terms"]) for r in top],
            "_row_id long, _score long, _terms long",
        )
        return (
            self.df()
            .where(F.col("_row_id").isin([r["_row_id"] for r in top]))
            .join(F.broadcast(hits), "_row_id")
            .orderBy(F.col("_score").desc(), F.col("_row_id"))
        )

    def insert_prepare(self, primary_keys: list | None = None) -> dict:
        """Reference S2 (table_segment_mvp.cpp:816-876): capacity,
        record count, and 32-bit-packed PK-existence bitmasks."""
        meta = self._load_meta()
        record_number = self._count(meta)
        masks: list[int] = []
        if primary_keys:
            pk_field = self.schema.primary_key
            if pk_field is None:
                raise VectorDBError(
                    "DB_UNEXPECTED_ERROR", f"Primary key not found: {self.schema.name}"
                )
            existing = {
                r[0]
                for r in self.df()
                .where(F.col(pk_field.name).isin(primary_keys))
                .select(pk_field.name)
                .collect()
            }
            mask = 0
            for i, pk in enumerate(primary_keys):
                if pk in existing:
                    mask |= 1 << (i % 32)
                if i % 32 == 31:
                    masks.append(mask)
                    mask = 0
            if len(primary_keys) % 32 != 0:
                masks.append(mask)
        return {
            "capacity": self._capacity(meta),
            "recordNumber": record_number,
            "masks": masks,
        }

    def statistics(self) -> dict:
        """Reference S11 (db_server.cpp:105-119)."""
        return {"totalRecords": self._count(self._load_meta())}


class _SkipRecord(Exception):
    pass


def _validate_sparse(v, dimension: int) -> Row:
    """Sparse insert validation (reference table_segment_mvp.cpp:511-553):
    indices strictly increasing, non-negative, < dimension; length
    mismatch → skip record (not an error)."""
    if not isinstance(v, dict) or "indices" not in v or "values" not in v:
        raise _SkipRecord()
    idx, vals = list(v["indices"]), list(v["values"])
    if len(idx) != len(vals):
        raise _SkipRecord()
    prev = -1
    for i in idx:
        i = int(i)
        if i < 0 or i <= prev or i >= dimension:
            raise _SkipRecord()
        prev = i
    return Row(indices=[int(i) for i in idx], values=[float(x) for x in vals])


def _normalize_dense_query(query_vector, f: FieldSchema) -> list[float]:
    q = [float(x) for x in query_vector]
    if len(q) != f.dimension:
        raise VectorDBError(
            "INVALID_PAYLOAD",
            f"Query vector dimension {len(q)} != field dimension {f.dimension}.",
        )
    if f.metric == "COSINE":
        n = math.sqrt(sum(x * x for x in q))
        if n > 0:
            q = [x / n for x in q]
    return q


def _normalize_sparse_query(query_vector, f: FieldSchema) -> dict:
    if not isinstance(query_vector, dict):
        raise VectorDBError("INVALID_PAYLOAD", "Sparse query vector must be a dict.")
    idx = [int(i) for i in query_vector["indices"]]
    vals = [float(x) for x in query_vector["values"]]
    if len(idx) != len(vals):
        raise VectorDBError("INVALID_PAYLOAD", "indices/values length mismatch.")
    if f.metric == "COSINE":
        n = math.sqrt(sum(x * x for x in vals))
        if n > 0:
            vals = [x / n for x in vals]
    return {"indices": idx, "values": vals}
