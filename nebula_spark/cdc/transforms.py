"""Row-level transform chain — the reference's pipeline transforms
(/root/reference/internal/pipeline/simple_pipeline.go:291-350, 535-627)
as composable DataFrame rewrites. Each transform is DataFrame→DataFrame
so the chain stays one Catalyst plan (no per-record Python; a nil-return
"drop" becomes a filter)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F

Transform = Callable[[DataFrame], DataFrame]


def field_mapper(mapping: dict[str, str]) -> Transform:
    """Rename fields per mapping, preserving unmapped columns
    (FieldMapperTransform, simple_pipeline.go:535-562)."""

    def t(df: DataFrame) -> DataFrame:
        return df.select(
            *[F.col(c).alias(mapping.get(c, c)) for c in df.columns]
        )

    return t


def filter_transform(predicate: Column | str) -> Transform:
    """Keep rows matching the predicate (FilterTransform,
    simple_pipeline.go:580-587)."""

    def t(df: DataFrame) -> DataFrame:
        return df.filter(predicate)

    return t


def type_converter(conversions: dict[str, str], strict: bool = False) -> Transform:
    """Per-field type conversion (TypeConverterTransform,
    simple_pipeline.go:611-627; coercion suite, destinations/iceberg/
    utils.go:381-512). strict=False uses try_cast (bad values → null),
    strict=True uses cast (bad values raise under ANSI)."""

    def t(df: DataFrame) -> DataFrame:
        out = df
        for name, dtype in conversions.items():
            col = F.col(name)
            out = out.withColumn(
                name, col.cast(dtype) if strict else col.try_cast(dtype)
            )
        return out

    return t


def column_projection(
    whitelist: list[str] | None = None, blacklist: list[str] | None = None
) -> Transform:
    """Per-table column white/blacklists (internal/pipeline/cdc.go:62-65)."""

    def t(df: DataFrame) -> DataFrame:
        cols = df.columns
        if whitelist:
            cols = [c for c in cols if c in whitelist]
        if blacklist:
            cols = [c for c in cols if c not in blacklist]
        return df.select(*cols)

    return t


def with_columns(exprs: dict[str, Column]) -> Transform:
    """Configured per-field rewrite hooks (internal/pipeline/cdc.go:68-70)."""

    def t(df: DataFrame) -> DataFrame:
        return df.withColumns(exprs)

    return t


def chain(*transforms: Transform) -> Transform:
    """Sequential composition — the reference applies transforms in
    order, short-circuiting on drop (simple_pipeline.go:291-350)."""

    def t(df: DataFrame) -> DataFrame:
        for tr in transforms:
            df = tr(df)
        return df

    return t
