"""CQL → Spark type mapping — the cell-decode contract.

Mirror of ``StreamHelpers.getValueFromCell`` /
``mapCqlTypeToJavaType`` (StreamHelpers.java:76-117,129-178): each
CQL cell type maps to a JVM value; smallint/tinyint widen to int;
unknown types log an error and fall back to the text accessor
(:112-115).  Here the mapping is schema-level (Spark types), applied
once per table instead of per cell — plus the collection types the
reference cannot handle (list/set/map/vector), which the engine
supports natively as a strict superset (SURVEY §1.2).
"""

from __future__ import annotations

import logging
import re

from pyspark.sql import types as T

logger = logging.getLogger(__name__)

#: scalar CQL type -> Spark type (StreamHelpers.java:129-178)
_SCALARS: dict[str, T.DataType] = {
    "text": T.StringType(),
    "varchar": T.StringType(),
    "ascii": T.StringType(),
    "inet": T.StringType(),
    "uuid": T.StringType(),
    "timeuuid": T.StringType(),
    "date": T.DateType(),
    "int": T.IntegerType(),
    "smallint": T.IntegerType(),  # widened, :92-95
    "tinyint": T.IntegerType(),  # widened
    "bigint": T.LongType(),
    "counter": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "decimal": T.DecimalType(38, 18),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "blob": T.BinaryType(),
}

_COLLECTION_RE = re.compile(
    r"^(list|set|map|vector|frozen)\s*<\s*(.+)\s*>$", re.IGNORECASE
)


def cql_to_spark_type(cql: str) -> T.DataType:
    """Resolve a CQL type string to a Spark type.

    Unknown scalar types fall back to StringType with an error log —
    the reference's unknown-type-to-text fallback
    (StreamHelpers.java:112-115).  Collections (which would hit that
    fallback in the reference) resolve to proper nested types.
    """
    s = cql.strip().lower()
    if s in _SCALARS:
        return _SCALARS[s]
    m = _COLLECTION_RE.match(s)
    if m:
        outer, inner = m.group(1), m.group(2)
        if outer == "frozen":
            return cql_to_spark_type(inner)
        if outer in ("list", "set"):
            return T.ArrayType(cql_to_spark_type(inner))
        if outer == "vector":
            # 'vector<float, 256>' -> array<float>
            elem = inner.split(",")[0]
            return T.ArrayType(cql_to_spark_type(elem))
        if outer == "map":
            depth, split_at = 0, -1
            for i, ch in enumerate(inner):
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                elif ch == "," and depth == 0:
                    split_at = i
                    break
            key, val = inner[:split_at], inner[split_at + 1 :]
            return T.MapType(
                cql_to_spark_type(key), cql_to_spark_type(val)
            )
    logger.error("Unknown CQL type %r; falling back to text", cql)
    return T.StringType()


def cql_schema(columns: dict[str, str]) -> T.StructType:
    """column-name -> CQL-type mapping to a nullable StructType (every
    data field nullable, matching the reference's Avro null-unions —
    AbstractAvroConverter.java:464)."""
    return T.StructType(
        [
            T.StructField(name, cql_to_spark_type(cql), True)
            for name, cql in columns.items()
        ]
    )
