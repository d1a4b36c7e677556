from nebula_spark.cdc.dedup import lww_dedup
from nebula_spark.cdc.binlog import gen_binlog, gen_base_table, BINLOG_SCHEMA
from nebula_spark.cdc.filters import EventFilter
from nebula_spark.cdc.apply import apply_changes

__all__ = [
    "lww_dedup",
    "gen_binlog",
    "gen_base_table",
    "BINLOG_SCHEMA",
    "EventFilter",
    "apply_changes",
]
