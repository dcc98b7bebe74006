"""Field types, table schema, and validation.

Mirrors the reference's data model (SURVEY.md §1; reference
engine/db/catalog/meta_types.hpp:19-107 for types and wire names,
basic_meta_impl.cpp:315-460 for validation) on Spark types:

| wire name             | Spark type                                        |
|-----------------------|---------------------------------------------------|
| TINYINT..BIGINT       | Byte/Short/Integer/LongType                       |
| FLOAT / DOUBLE        | Float/DoubleType                                  |
| BOOL                  | BooleanType                                       |
| STRING / JSON         | StringType (JSON opaque, rejected in filters)     |
| VECTOR_FLOAT/_DOUBLE  | ArrayType(FloatType) (stored float32 either way)  |
| SPARSE_VECTOR_*       | Struct(indices: array<int>, values: array<float>) |
| GEO_POINT             | Struct(latitude: double, longitude: double)       |
"""

from __future__ import annotations

import enum
import re
from dataclasses import dataclass, field

from pyspark.sql import types as T


class VectorDBError(Exception):
    """Engine error with a reference-parity error code."""

    def __init__(self, code: str, message: str):
        super().__init__(message)
        self.code = code
        self.message = message


def invalid_expr(msg: str) -> VectorDBError:
    return VectorDBError("INVALID_EXPR", msg)


def not_implemented(msg: str) -> VectorDBError:
    return VectorDBError("NOT_IMPLEMENTED_ERROR", msg)


class FieldType(str, enum.Enum):
    INT1 = "TINYINT"
    INT2 = "SMALLINT"
    INT4 = "INT"
    INT8 = "BIGINT"
    FLOAT = "FLOAT"
    DOUBLE = "DOUBLE"
    BOOL = "BOOL"
    STRING = "STRING"
    JSON = "JSON"
    VECTOR_FLOAT = "VECTOR_FLOAT"
    VECTOR_DOUBLE = "VECTOR_DOUBLE"
    SPARSE_VECTOR_FLOAT = "SPARSE_VECTOR_FLOAT"
    SPARSE_VECTOR_DOUBLE = "SPARSE_VECTOR_DOUBLE"
    GEO_POINT = "GEO_POINT"

    @property
    def is_vector(self) -> bool:
        return self in _DENSE | _SPARSE

    @property
    def is_dense_vector(self) -> bool:
        return self in _DENSE

    @property
    def is_sparse_vector(self) -> bool:
        return self in _SPARSE

    @property
    def is_int(self) -> bool:
        return self in {FieldType.INT1, FieldType.INT2, FieldType.INT4, FieldType.INT8}

    @property
    def is_real(self) -> bool:
        return self in {FieldType.FLOAT, FieldType.DOUBLE}

    @property
    def is_string(self) -> bool:
        return self is FieldType.STRING


_DENSE = {FieldType.VECTOR_FLOAT, FieldType.VECTOR_DOUBLE}
_SPARSE = {FieldType.SPARSE_VECTOR_FLOAT, FieldType.SPARSE_VECTOR_DOUBLE}

PK_TYPES = {
    FieldType.INT1,
    FieldType.INT2,
    FieldType.INT4,
    FieldType.INT8,
    FieldType.STRING,
}

METRICS = {"EUCLIDEAN", "COSINE", "DOT_PRODUCT"}

SPARSE_VECTOR_SPARK_TYPE = T.StructType(
    [
        T.StructField("indices", T.ArrayType(T.IntegerType()), False),
        T.StructField("values", T.ArrayType(T.FloatType()), False),
    ]
)

GEO_POINT_SPARK_TYPE = T.StructType(
    [
        T.StructField("latitude", T.DoubleType(), False),
        T.StructField("longitude", T.DoubleType(), False),
    ]
)


def spark_type_for(ft: FieldType) -> T.DataType:
    if ft == FieldType.INT1:
        return T.ByteType()
    if ft == FieldType.INT2:
        return T.ShortType()
    if ft == FieldType.INT4:
        return T.IntegerType()
    if ft == FieldType.INT8:
        return T.LongType()
    if ft == FieldType.FLOAT:
        return T.FloatType()
    if ft == FieldType.DOUBLE:
        return T.DoubleType()
    if ft == FieldType.BOOL:
        return T.BooleanType()
    if ft in (FieldType.STRING, FieldType.JSON):
        return T.StringType()
    if ft in _DENSE:
        # reference stores float32 even for VECTOR_DOUBLE
        # (table_segment_mvp.cpp:85-86,106-111)
        return T.ArrayType(T.FloatType())
    if ft in _SPARSE:
        return SPARSE_VECTOR_SPARK_TYPE
    if ft == FieldType.GEO_POINT:
        return GEO_POINT_SPARK_TYPE
    raise ValueError(f"unmapped field type {ft}")


_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


@dataclass
class FieldSchema:
    name: str
    field_type: FieldType
    primary_key: bool = False
    dimension: int = 0
    metric: str = ""  # EUCLIDEAN | COSINE | DOT_PRODUCT for vector fields
    is_index_field: bool = False  # hidden auto-embedding target (§1.4)

    @classmethod
    def from_json(cls, obj: dict) -> FieldSchema:
        return cls(
            name=obj["name"],
            field_type=FieldType(obj.get("dataType", "STRING").upper()),
            primary_key=bool(obj.get("primaryKey", False)),
            dimension=int(obj.get("dimensions", 0)),
            metric=str(obj.get("metricType", "")).upper(),
            is_index_field=bool(obj.get("isIndexField", False)),
        )

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "dataType": self.field_type.value,
            "primaryKey": self.primary_key,
            "dimensions": self.dimension,
            "metricType": self.metric,
            "isIndexField": self.is_index_field,
        }


@dataclass
class TableSchema:
    name: str
    fields: list[FieldSchema] = field(default_factory=list)

    def field_map(self) -> dict[str, FieldType]:
        return {f.name: f.field_type for f in self.fields}

    def get(self, name: str) -> FieldSchema | None:
        for f in self.fields:
            if f.name == name:
                return f
        return None

    @property
    def primary_key(self) -> FieldSchema | None:
        for f in self.fields:
            if f.primary_key:
                return f
        return None

    def vector_fields(self) -> list[FieldSchema]:
        return [f for f in self.fields if f.field_type.is_vector]

    def projectable_fields(self) -> list[FieldSchema]:
        """'Project all' excludes hidden index fields
        (reference table_mvp.cpp:474-477)."""
        return [f for f in self.fields if not f.is_index_field]

    def to_spark_schema(self, *, with_row_id: bool = False) -> T.StructType:
        out = [
            T.StructField(f.name, spark_type_for(f.field_type), False)
            for f in self.fields
        ]
        if with_row_id:
            out.append(T.StructField("_row_id", T.LongType(), False))
        return T.StructType(out)

    @classmethod
    def from_json(cls, obj: dict) -> TableSchema:
        return cls(
            name=obj["name"],
            fields=[FieldSchema.from_json(f) for f in obj.get("fields", [])],
        )

    def to_json(self) -> dict:
        return {"name": self.name, "fields": [f.to_json() for f in self.fields]}


def validate_schema(schema: TableSchema) -> None:
    """Schema validation with reference-parity rules
    (basic_meta_impl.cpp:315-460)."""
    if not _IDENT_RE.match(schema.name):
        raise VectorDBError("INVALID_TABLE_NAME", f"Invalid table name: {schema.name}")
    if not schema.fields:
        raise VectorDBError("INVALID_SCHEMA", "Table must have at least one field.")
    seen: set[str] = set()
    pk_count = 0
    for f in schema.fields:
        if not _IDENT_RE.match(f.name):
            raise VectorDBError("INVALID_FIELD_NAME", f"Invalid field name: {f.name}")
        if f.name in seen:
            raise VectorDBError("INVALID_SCHEMA", f"Duplicate field name: {f.name}")
        seen.add(f.name)
        if f.primary_key:
            pk_count += 1
            if f.field_type not in PK_TYPES:
                raise VectorDBError(
                    "INVALID_SCHEMA",
                    f"Primary key field {f.name} must be integer or string.",
                )
        if f.field_type.is_vector:
            if f.dimension <= 0:
                raise VectorDBError(
                    "INVALID_SCHEMA",
                    f"Vector field {f.name} needs a positive dimension.",
                )
            if f.metric not in METRICS:
                raise VectorDBError(
                    "INVALID_SCHEMA",
                    f"Vector field {f.name} needs a metric in {sorted(METRICS)}.",
                )
    if pk_count > 1:
        raise VectorDBError("INVALID_SCHEMA", "At most one primary key is allowed.")
    if not any(f.field_type.is_vector for f in schema.fields):
        # reference requires >= 1 vector field (basic_meta_impl.cpp:456-458)
        raise VectorDBError(
            "INVALID_SCHEMA", "Table must have at least one vector field."
        )


def field_map_from_spark(schema: T.StructType) -> dict[str, FieldType]:
    """Best-effort FieldType map for an arbitrary DataFrame (lets the
    filter language run over plain parquet tables, e.g. the testdata)."""
    out: dict[str, FieldType] = {}
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, T.ByteType):
            out[f.name] = FieldType.INT1
        elif isinstance(dt, T.ShortType):
            out[f.name] = FieldType.INT2
        elif isinstance(dt, T.IntegerType):
            out[f.name] = FieldType.INT4
        elif isinstance(dt, T.LongType):
            out[f.name] = FieldType.INT8
        elif isinstance(dt, T.FloatType):
            out[f.name] = FieldType.FLOAT
        elif isinstance(dt, T.DoubleType):
            out[f.name] = FieldType.DOUBLE
        elif isinstance(dt, T.BooleanType):
            out[f.name] = FieldType.BOOL
        elif isinstance(dt, T.StringType):
            out[f.name] = FieldType.STRING
        elif isinstance(dt, T.ArrayType) and isinstance(dt.elementType, (T.FloatType, T.DoubleType)):
            out[f.name] = FieldType.VECTOR_FLOAT
        elif isinstance(dt, T.StructType) and set(dt.fieldNames()) == {"indices", "values"}:
            out[f.name] = FieldType.SPARSE_VECTOR_FLOAT
        elif isinstance(dt, T.StructType) and set(dt.fieldNames()) == {"latitude", "longitude"}:
            out[f.name] = FieldType.GEO_POINT
        # other types: not addressable by the filter language
    return out
