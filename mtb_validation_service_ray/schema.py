"""Pinned Arrow schemas.

The reference's data model is a fixed, compile-time Scala case-class
schema (SURVEY.md §1.1; reference MTBValidators.scala:42).  Python has no
compile-time guarantee, so the engine pins an explicit ``pyarrow.Schema``
and runs a schema-conformance check as its "parsing" step.

Input shape is authoritative per BASELINE.json ``input_hint``:
``image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64`` (+ an engine-added ``partition_id`` carried
for per-partition verdicts/checkpoints, FIXTURES.md §1).
"""

from __future__ import annotations

import pyarrow as pa

# --- input table -----------------------------------------------------------

IMAGE_SCHEMA = pa.schema(
    [
        pa.field("image_id", pa.string()),
        pa.field("bytes", pa.binary()),
        pa.field("w", pa.int32()),
        pa.field("h", pa.int32()),
        pa.field("fmt", pa.string()),
        pa.field("caption", pa.string()),
        pa.field("phash", pa.int64()),
    ]
)

# carried alongside the payload columns for checkpoint/verdict grouping
PARTITION_COL = "partition_id"

IMAGE_SCHEMA_PARTITIONED = IMAGE_SCHEMA.append(pa.field(PARTITION_COL, pa.int32()))

# --- violations table ------------------------------------------------------
# One row per issue — exactly the reference's Issue(severity, message, path)
# tuple keyed by record (SURVEY.md §1.1 output model;
# reference MTBValidators.scala:49-55 severities, :68-123 path nodes).

VIOLATION_SCHEMA = pa.schema(
    [
        pa.field("record_id", pa.string()),
        pa.field("rule_id", pa.string()),
        pa.field("severity", pa.string()),  # info|warning|error|fatal
        pa.field("path", pa.string()),
        pa.field("message", pa.string()),
        pa.field(PARTITION_COL, pa.int32()),
    ]
)

# --- verdicts table --------------------------------------------------------
# Per-record max-severity roll-up; ``fatal`` ⇒ rejected, mirroring the
# reference's FatalIssuesDetected outcome (Tests.scala:45-56).

VERDICT_SCHEMA = pa.schema(
    [
        pa.field("record_id", pa.string()),
        pa.field("verdict", pa.string()),  # pass|info|warning|error|fatal
        pa.field("n_issues", pa.int64()),
        pa.field("accepted", pa.bool_()),
        pa.field(PARTITION_COL, pa.int32()),
    ]
)


def empty_violations() -> pa.Table:
    return VIOLATION_SCHEMA.empty_table()


def violations_table(
    record_ids, rule_id: str, severity: str, path, messages, partition_ids=None
) -> pa.Table:
    """Build a violations Table for one rule from parallel arrays.
    ``path`` may be a single string or a per-violation list (dynamic
    list-index segments, e.g. ``/record/caption/words[2]``)."""
    n = len(record_ids)
    if isinstance(messages, str):
        messages = [messages] * n
    if isinstance(path, str):
        path = [path] * n
    if partition_ids is None:
        partition_ids = pa.nulls(n, pa.int32())
    return pa.table(
        {
            "record_id": pa.array(record_ids, pa.string()),
            "rule_id": pa.array([rule_id] * n, pa.string()),
            "severity": pa.array([severity] * n, pa.string()),
            "path": pa.array(path, pa.string()),
            "message": pa.array(messages, pa.string()),
            PARTITION_COL: pa.array(partition_ids, pa.int32())
            if not isinstance(partition_ids, pa.Array)
            else partition_ids.cast(pa.int32()),
        },
        schema=VIOLATION_SCHEMA,
    )


class SchemaMismatch(ValueError):
    pass


def check_schema(table_schema: pa.Schema, *, strict: bool = False) -> list[str]:
    """Schema-conformance check (the engine's parse step).

    Returns a list of human-readable problems; empty list = conformant.
    ``strict`` also rejects extra columns beyond the pinned schema +
    ``partition_id``.
    """
    problems: list[str] = []
    allowed_extra = {PARTITION_COL}
    names = set(table_schema.names)
    for field in IMAGE_SCHEMA:
        if field.name not in names:
            problems.append(f"missing column {field.name!r}")
            continue
        actual = table_schema.field(field.name).type
        if actual != field.type and not (
            pa.types.is_large_binary(actual) and pa.types.is_binary(field.type)
        ) and not (
            pa.types.is_large_string(actual) and pa.types.is_string(field.type)
        ):
            problems.append(
                f"column {field.name!r}: expected {field.type}, got {actual}"
            )
    if strict:
        for name in table_schema.names:
            if name not in set(IMAGE_SCHEMA.names) | allowed_extra:
                problems.append(f"unexpected column {name!r}")
    return problems
