from nebula_spark.evolution.schema_evolution import (
    SchemaChange,
    check_compatibility,
    check_compatibility_with_history,
    diff_schemas,
    evolve_schema,
)

__all__ = [
    "SchemaChange",
    "diff_schemas",
    "check_compatibility",
    "check_compatibility_with_history",
    "evolve_schema",
]
