from nebula_spark.evolution.schema_evolution import (
    SchemaChange,
    diff_schemas,
    check_compatibility,
    evolve_schema,
)

__all__ = ["SchemaChange", "diff_schemas", "check_compatibility", "evolve_schema"]
