"""Type inference — the reference's TypeInferenceEngine
(pkg/schema/type_inference.go:17-128) re-expressed as ONE aggregation.

The reference samples up to 1000 values per field and regex-detects
ints/floats/bools/timestamps/dates/emails/URLs/UUIDs/JSON, promoting a
type at 0.95 confidence. Here the whole sample is analyzed in a single
Spark job: per column, count regex matches for every candidate type
(conditional-sum aggregates, codegen'd), then pick the most specific
type that clears the threshold. No per-row Python."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

# candidate patterns, most→least specific (first match at threshold wins)
_PATTERNS: list[tuple[str, str]] = [
    ("boolean", r"^(?i)(true|false)$"),
    ("long", r"^[+-]?\d{1,18}$"),
    ("double", r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$"),
    ("timestamp", r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|[+-]\d{2}:?\d{2})?$"),
    ("date", r"^\d{4}-\d{2}-\d{2}$"),
    ("uuid", r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"),
    ("email", r"^[^@\s]+@[^@\s]+\.[^@\s]+$"),
    ("url", r"^https?://\S+$"),
    ("json", r"^\s*[\[{].*[\]}]\s*$"),
]

_SPARK_TYPES = {
    "boolean": T.BooleanType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    # semantic string types stay strings on the lake side
    "uuid": T.StringType(),
    "email": T.StringType(),
    "url": T.StringType(),
    "json": T.StringType(),
    "string": T.StringType(),
}


def infer_types(
    df: DataFrame,
    columns: list[str] | None = None,
    sample_rows: int = 1000,
    confidence: float = 0.95,
) -> dict[str, str]:
    """Per-column inferred semantic type name (see _PATTERNS keys plus
    'string'). One aggregation job over a driver-bounded sample."""
    cols = columns or [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
    if not cols:
        return {}
    sample = df.select(*cols).limit(sample_rows)
    aggs = []
    for c in cols:
        v = F.trim(F.col(c))
        present = v.isNotNull() & (v != "")
        aggs.append(F.sum(present.cast("long")).alias(f"{c}__n"))
        for name, pat in _PATTERNS:
            aggs.append(
                F.sum((present & v.rlike(pat)).cast("long")).alias(f"{c}__{name}")
            )
    row = sample.agg(*aggs).collect()[0].asDict()
    out: dict[str, str] = {}
    for c in cols:
        n = row[f"{c}__n"] or 0
        chosen = "string"
        if n > 0:
            # most specific first; 'double' subsumes 'long', so prefer
            # long when it alone clears the bar
            for name, _ in _PATTERNS:
                if (row[f"{c}__{name}"] or 0) / n >= confidence:
                    chosen = name
                    break
        out[c] = chosen
    return out


def infer_schema(
    df: DataFrame,
    columns: list[str] | None = None,
    sample_rows: int = 1000,
    confidence: float = 0.95,
) -> T.StructType:
    """StructType with inferred types (non-string columns pass through)."""
    inferred = infer_types(df, columns, sample_rows, confidence)
    fields = []
    for f in df.schema.fields:
        dt = _SPARK_TYPES[inferred[f.name]] if f.name in inferred else f.dataType
        fields.append(T.StructField(f.name, dt, True))
    return T.StructType(fields)


def coerce(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Apply an inferred schema with try_cast (bad values → null) — the
    reference's safe coercion suite (destinations/iceberg/utils.go:
    381-512)."""
    cols = []
    for f in schema.fields:
        cur = df.schema[f.name].dataType if f.name in df.columns else None
        if cur == f.dataType:
            cols.append(F.col(f.name))
        else:
            cols.append(F.col(f.name).try_cast(f.dataType).alias(f.name))
    return df.select(*cols)
