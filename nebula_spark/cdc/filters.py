"""EventFilter — declarative change-event filtering.

Re-expresses the reference's CDC event filter
(/root/reference/pkg/cdc/types.go:128-141, 322-434): include/exclude
tables, operation whitelist, and per-field predicates with operators
``eq ne gt lt gte lte in like``. Instead of a per-record Go loop, the
config compiles to a single Spark Column so Catalyst pushes it into the
scan (visible as PushedFilters on parquet sources).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

_OPS = {
    "eq": lambda c, v: c == v,
    "ne": lambda c, v: c != v,
    "gt": lambda c, v: c > v,
    "lt": lambda c, v: c < v,
    "gte": lambda c, v: c >= v,
    "lte": lambda c, v: c <= v,
    "in": lambda c, v: c.isin(*v),
    "like": lambda c, v: c.like(v),
}


@dataclass
class EventFilter:
    include_tables: list[str] | None = None
    exclude_tables: list[str] | None = None
    operations: list[str] | None = None  # e.g. ["INSERT", "UPDATE"]
    field_predicates: list[tuple[str, str, object]] = field(default_factory=list)
    table_col: str = "source_table"
    op_col: str = "op"

    def predicate(self, df: DataFrame) -> Column:
        cond = F.lit(True)
        if self.include_tables and self.table_col in df.columns:
            cond = cond & F.col(self.table_col).isin(*self.include_tables)
        if self.exclude_tables and self.table_col in df.columns:
            cond = cond & ~F.col(self.table_col).isin(*self.exclude_tables)
        if self.operations and self.op_col in df.columns:
            cond = cond & F.col(self.op_col).isin(*self.operations)
        for name, oper, value in self.field_predicates:
            if oper not in _OPS:
                raise ValueError(f"unknown predicate op {oper!r}")
            cond = cond & _OPS[oper](F.col(name), value)
        return cond

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(self.predicate(df))
