"""Schema evolution — StructType diff, compatibility rules, and the
merge-on-write policy.

Re-expresses the reference's schema evolution engine
(/root/reference/pkg/schema/evolution.go): change detection (46-54,
170-238), compatibility modes BACKWARD/FORWARD/FULL (85-111, 241-324),
the type-compat lattice (327-350), and the default/strict/flexible
strategies (394-515) — over Spark StructTypes instead of its Field
maps. The *data* side of evolution (old files read under the new
schema) is handled by LakeTable's per-schema-version file groups +
``align_to_schema`` casts; this module only decides what the new table
schema is and whether the change is legal.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

ADD_FIELD = "ADD_FIELD"
REMOVE_FIELD = "REMOVE_FIELD"
MODIFY_TYPE = "MODIFY_TYPE"
MODIFY_REQUIRED = "MODIFY_REQUIRED"
RENAME_FIELD = "RENAME_FIELD"

# widening lattice (evolution.go:327-350 allows integer→float→string;
# we keep the numeric widenings that are lossless on the lake side and
# string as the flexible-mode escape hatch)
_WIDENINGS: dict[tuple[str, str], bool] = {
    ("integer", "long"): True,
    ("integer", "double"): True,
    ("long", "double"): True,
    ("float", "double"): True,
    ("date", "timestamp"): True,
}


def _tname(dt: T.DataType) -> str:
    return dt.typeName()


def widens_to(src: T.DataType, dst: T.DataType) -> bool:
    if src == dst:
        return True
    if isinstance(src, T.ArrayType) and isinstance(dst, T.ArrayType):
        return widens_to(src.elementType, dst.elementType)
    if isinstance(dst, T.StringType):
        return True  # anything can stringify (flexible mode only)
    return _WIDENINGS.get((_tname(src), _tname(dst)), False)


@dataclass
class SchemaChange:
    kind: str
    field: str
    from_type: str | None = None
    to_type: str | None = None


def diff_schemas(old: T.StructType, new: T.StructType) -> list[SchemaChange]:
    """Field-level diff, old → new (evolution.go:170-238)."""
    changes: list[SchemaChange] = []
    old_f = {f.name: f for f in old.fields}
    new_f = {f.name: f for f in new.fields}
    for name, f in new_f.items():
        if name not in old_f:
            changes.append(SchemaChange(ADD_FIELD, name, None, _tname(f.dataType)))
        else:
            o = old_f[name]
            if o.dataType != f.dataType:
                changes.append(
                    SchemaChange(MODIFY_TYPE, name, _tname(o.dataType), _tname(f.dataType))
                )
            if o.nullable != f.nullable:
                changes.append(SchemaChange(MODIFY_REQUIRED, name))
    for name, f in old_f.items():
        if name not in new_f:
            changes.append(SchemaChange(REMOVE_FIELD, name, _tname(f.dataType), None))
    return changes


def check_compatibility(
    old: T.StructType, new: T.StructType, mode: str = "BACKWARD"
) -> list[str]:
    """Violations of the given compatibility mode (evolution.go:241-324;
    mode names incl. the *_TRANSITIVE variants from the reference's
    registry, pkg/schema/registry.go:27-40).
    BACKWARD: new schema can read old data — no required adds, no
    narrowing type changes, no removal of required fields. FORWARD: old
    schema can read new data — no removals, adds must be optional.
    FULL: both. *_TRANSITIVE: same rule checked against every prior
    schema version, not just the latest — callers pass each historical
    schema as ``old`` in turn (LakeTable keeps all versions in the
    snapshot's ``schemas`` map). NONE: anything goes."""
    mode = mode.upper()
    if mode == "NONE":
        return []
    known = (
        "BACKWARD", "FORWARD", "FULL",
        "BACKWARD_TRANSITIVE", "FORWARD_TRANSITIVE", "FULL_TRANSITIVE",
    )
    if mode not in known:
        raise ValueError(f"unknown compatibility mode {mode!r}; one of {known} or NONE")
    old_f = {f.name: f for f in old.fields}
    violations: list[str] = []
    backward = mode in ("BACKWARD", "FULL", "BACKWARD_TRANSITIVE", "FULL_TRANSITIVE")
    forward = mode in ("FORWARD", "FULL", "FORWARD_TRANSITIVE", "FULL_TRANSITIVE")
    for ch in diff_schemas(old, new):
        if ch.kind == ADD_FIELD:
            nf = next(f for f in new.fields if f.name == ch.field)
            if not nf.nullable:
                violations.append(f"added field {ch.field} must be nullable ({mode})")
        elif ch.kind == REMOVE_FIELD:
            of = old_f[ch.field]
            if backward and not of.nullable:
                violations.append(f"cannot remove required field {ch.field} ({mode})")
            if forward:
                violations.append(f"cannot remove field {ch.field} (FORWARD)")
        elif ch.kind == MODIFY_TYPE:
            of, nf = old_f[ch.field], next(
                f for f in new.fields if f.name == ch.field
            )
            if backward and not widens_to(of.dataType, nf.dataType):
                violations.append(
                    f"incompatible type change {ch.field}: {ch.from_type}->{ch.to_type}"
                )
    return violations


def check_compatibility_with_history(
    history: list[T.StructType], new: T.StructType, mode: str = "BACKWARD"
) -> list[str]:
    """Registry-style compatibility over a schema HISTORY
    (pkg/schema/registry.go:27-40): the plain modes check ``new``
    against the latest schema only; the *_TRANSITIVE modes check it
    against EVERY prior version — an int→long widening is backward
    compatible with v3 but may not be with a v1 that declared the field
    required, and only the transitive check catches that. Violations
    are prefixed with the history index they came from."""
    if not history:
        return []
    mode_u = mode.upper()
    transitive = mode_u.endswith("_TRANSITIVE")
    base = mode_u.removesuffix("_TRANSITIVE")
    targets = list(enumerate(history)) if transitive else [(len(history) - 1, history[-1])]
    out: list[str] = []
    for i, old in targets:
        for v in check_compatibility(old, new, mode=mode_u if not transitive else base):
            out.append(f"v{i + 1}: {v}")
    return out


def evolve_schema(
    table_schema: T.StructType,
    batch_schema: T.StructType,
    policy: str = "default",
    renames: dict[str, str] | None = None,
) -> tuple[T.StructType, list[SchemaChange]]:
    """Merge an incoming batch schema into the table schema
    (strategies, evolution.go:394-515):

    - ``default``  — union-by-name; new fields appended as nullable,
      removed fields kept (optional), types widened along the lattice.
    - ``strict``   — only nullable ADD_FIELD allowed; any type change
      or removal raises.
    - ``flexible`` — like default but irreconcilable type conflicts
      degrade to string.

    ``renames`` maps old table column → new source column (the
    reference's declared-rename migration, pkg/schema/migration.go:
    233-256): the table column is carried forward under its new name
    (history preserved) instead of being treated as drop+add.
    """
    changes_pre: list[SchemaChange] = []
    if renames:
        batch_names = {f.name for f in batch_schema.fields}
        table_names = {f.name for f in table_schema.fields}
        eff = []
        for f in table_schema.fields:
            new_name = renames.get(f.name)
            if new_name and new_name not in table_names:
                if new_name not in batch_names:
                    raise ValueError(
                        f"declared rename {f.name!r}->{new_name!r} but the "
                        f"batch has no column {new_name!r}"
                    )
                changes_pre.append(
                    SchemaChange(RENAME_FIELD, f.name, None, new_name)
                )
                eff.append(T.StructField(new_name, f.dataType, f.nullable))
            else:
                eff.append(f)
        table_schema = T.StructType(eff)

    table_f = {f.name: f for f in table_schema.fields}
    out: list[T.StructField] = []
    changes: list[SchemaChange] = []

    for f in table_schema.fields:
        b = next((bf for bf in batch_schema.fields if bf.name == f.name), None)
        if b is None or b.dataType == f.dataType:
            out.append(f)  # removed fields kept optional (default strategy)
            continue
        if widens_to(f.dataType, b.dataType) and not isinstance(b.dataType, T.StringType):
            if policy == "strict":
                raise ValueError(f"strict policy: type change on {f.name}")
            # keep field metadata (e.g. initial_default) through widening
            out.append(T.StructField(f.name, b.dataType, True, f.metadata))
            changes.append(
                SchemaChange(MODIFY_TYPE, f.name, _tname(f.dataType), _tname(b.dataType))
            )
        elif widens_to(b.dataType, f.dataType):
            out.append(f)  # batch narrower than table: cast up on align
        elif policy == "flexible":
            out.append(T.StructField(f.name, T.StringType(), True, f.metadata))
            changes.append(
                SchemaChange(MODIFY_TYPE, f.name, _tname(f.dataType), "string")
            )
        else:
            raise ValueError(
                f"incompatible type change on {f.name}: "
                f"{_tname(f.dataType)} vs {_tname(b.dataType)}"
            )

    for b in batch_schema.fields:
        if b.name not in table_f:
            if policy == "strict" and not b.nullable:
                raise ValueError(f"strict policy: new field {b.name} must be nullable")
            out.append(T.StructField(b.name, b.dataType, True))
            changes.append(SchemaChange(ADD_FIELD, b.name, None, _tname(b.dataType)))

    return T.StructType(out), changes_pre + changes
