"""Rule model + vectorized row-local kernels.

Re-expresses the reference's validation DSL combinators
(`must be defined / nonEmpty / matchRegex / in set / in interval`,
`andThen`, `combineWith`, `errorsOr ... on node` — SURVEY.md §2.0,
reference MTBValidators.scala:211-320) as declarative ``Rule`` objects
whose kernels are pyarrow.compute / numpy expressions evaluated over one
Arrow batch at a time inside ``map_batches``.

Semantics preserved from the reference:

* **Issue accumulation, no short-circuit** — every rule runs over every
  row; all violations for a record are emitted (cats ValidatedNel,
  MTBValidators.scala:7, :255).
* **`andThen` gating** — a rule with ``requires=[...]`` is masked out on
  rows where any prerequisite rule already fired, so children of a
  failed precondition are not double-reported
  (MTBValidators.scala:243,252-254,302-305).
* **Severity grading** — each rule carries an explicit severity
  (info|warning|error|fatal); defaults mirror the reference's
  MissingValue→warning / MissingResult→error / unresolvable
  reference→fatal conventions (MTBValidators.scala:586,563-568,544-547).
* **Hierarchical paths** — each rule carries a static ``path``
  (the `at "seg"` / `on node` composition, MTBValidators.scala:68-123).

Rules are plain picklable dataclasses; per-worker compilation (regexes,
value-set Arrow arrays) happens once in ``RuleContext`` — the engine
analog of the reference's lazy-singleton code-system catalogs
(MTBValidators.scala:747-770).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable, ClassVar

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import PARTITION_COL, VIOLATION_SCHEMA, violations_table


def path_join(*segments: str) -> str:
    """Compose hierarchical issue-path segments — the engine's
    `validate(x) at "seg"` / `errorsOr(x) on node` combinator
    (MTBValidators.scala:224-227 produces `Tumor-Staging/TNM/T-Code`).
    ``path_join("record", "caption", "charset") == "/record/caption/charset"``."""
    parts = [s.strip("/") for s in segments if s and s.strip("/")]
    return "/" + "/".join(parts)


@dataclass(frozen=True)
class Rule:
    rule_id: str
    kind: str  # kernel name, see KERNELS
    severity: str  # info|warning|error|fatal
    path: str  # hierarchical issue path, e.g. "/record/caption/charset"
    params: dict[str, Any] = field(default_factory=dict)
    requires: tuple[str, ...] = ()  # andThen gating: prerequisite rule ids
    message: str = ""
    description: str = ""

    def render_message(self) -> str:
        return self.message or f"{self.kind} check failed"

    def at(self, *prefix: str) -> "Rule":
        """Re-rooted copy — the `validate … at "seg"` path prefixing."""
        import dataclasses

        return dataclasses.replace(self, path=path_join(*prefix, self.path))


@dataclass
class RuleSet:
    """Ordered rule registry + plugin hook (the engine's SPI analog —
    reference MTBValidationService.scala:22-24 SPILoader / META-INF
    registrations, SURVEY.md §2.2 #36)."""

    rules: list[Rule] = field(default_factory=list)
    name: str = "default"

    _PLUGINS: ClassVar[dict[str, Callable[[], list]]] = {}

    def add(self, rule: Rule) -> "RuleSet":
        if any(r.rule_id == rule.rule_id for r in self.rules):
            raise ValueError(f"duplicate rule id {rule.rule_id}")
        self.rules.append(rule)
        return self

    def extend(self, rules) -> "RuleSet":
        for r in rules:
            self.add(r)
        return self

    def without(self, *rule_ids: str) -> "RuleSet":
        drop = set(rule_ids)
        return RuleSet(
            [r for r in self.rules if r.rule_id not in drop], name=self.name
        )

    def only(self, *rule_ids: str) -> "RuleSet":
        keep = set(rule_ids)
        return RuleSet([r for r in self.rules if r.rule_id in keep], name=self.name)

    def by_kind(self, *kinds: str) -> list[Rule]:
        ks = set(kinds)
        return [r for r in self.rules if r.kind in ks]

    def at(self, *prefix: str) -> "RuleSet":
        """Hierarchical composition: every rule re-rooted under the
        given path segments (the `validate(child) at "seg"` combinator,
        MTBValidators.scala:224-227) — lets a sub-entity rule set be
        embedded into a parent's path tree."""
        return RuleSet([r.at(*prefix) for r in self.rules], name=self.name)

    def content_hash(self) -> str:
        """Stable hash of the rule definitions — recorded in checkpoint
        manifests so a resume with a changed rule set recomputes."""
        import hashlib
        import json

        payload = json.dumps(
            [
                {
                    "id": r.rule_id,
                    "kind": r.kind,
                    "severity": r.severity,
                    "path": r.path,
                    "params": {k: sorted(v) if isinstance(v, (set, frozenset)) else v
                               for k, v in sorted(r.params.items())},
                    "requires": list(r.requires),
                }
                for r in self.rules
            ],
            sort_keys=True,
            default=str,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    # plugin registry ------------------------------------------------------
    @classmethod
    def register_plugin(cls, name: str, provider: Callable[[], list[Rule]]) -> None:
        cls._PLUGINS[name] = provider

    @classmethod
    def from_plugins(cls, *names: str, base: "RuleSet | None" = None) -> "RuleSet":
        rs = RuleSet(list(base.rules) if base else [], name="+".join(names) or "empty")
        for n in names:
            rs.extend(cls._PLUGINS[n]())
        return rs


class RuleContext:
    """Per-worker compiled state: regexes, value-set arrays, broadcast
    reference-key sets.  Built once per actor in ``RowPass.__init__``
    (load-once-per-worker, SURVEY.md EP2)."""

    def __init__(self, ruleset: RuleSet, broadcast: dict[str, Any] | None = None):
        self.ruleset = ruleset
        self.broadcast = broadcast or {}
        self.compiled_regex: dict[str, re.Pattern] = {}
        self.value_arrays: dict[str, pa.Array] = {}
        for r in ruleset.rules:
            if "pattern" in r.params:
                self.compiled_regex[r.rule_id] = re.compile(r.params["pattern"])
            if "values" in r.params:
                self.value_arrays[r.rule_id] = pa.array(
                    sorted(r.params["values"]), pa.string()
                )

    def value_array(self, rule: Rule) -> pa.Array:
        return self.value_arrays[rule.rule_id]


def _as_numpy_bool(arr: pa.Array | pa.ChunkedArray, null_as: bool = False) -> np.ndarray:
    arr = pc.fill_null(arr, null_as)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False).astype(bool)


def _col(batch: pa.Table, name: str):
    return batch.column(name)


# --- kernels ---------------------------------------------------------------
# Each kernel: (batch, rule, ctx) -> np.ndarray[bool] "violated" mask.


def k_presence(batch: pa.Table, rule: Rule, ctx: RuleContext) -> np.ndarray:
    """`x must be (defined)` — null (and optionally empty) values
    (MTBValidators.scala:242-244)."""
    col = _col(batch, rule.params["col"])
    missing = pc.is_null(col)
    if rule.params.get("treat_empty_as_missing", True):
        typ = col.type
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            missing = pc.or_(missing, pc.equal(pc.utf8_length(pc.fill_null(col, "")), 0))
        elif pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
            missing = pc.or_(
                missing, pc.equal(pc.binary_length(pc.fill_null(col, b"")), 0)
            )
    return _as_numpy_bool(missing)


def k_value_set(batch: pa.Table, rule: Rule, ctx: RuleContext) -> np.ndarray:
    """`must be (in set)` / code ∈ catalog (csCodingValidator,
    MTBValidators.scala:144,155).  Nulls are the presence rule's business."""
    col = _col(batch, rule.params["col"])
    ok = pc.is_in(col, value_set=ctx.value_array(rule))
    return _as_numpy_bool(pc.and_(pc.invert(ok), pc.is_valid(col)))


def k_regex(batch: pa.Table, rule: Rule, ctx: RuleContext) -> np.ndarray:
    """`must matchRegex (pattern)` — anchored full match
    (MTBValidators.scala:220-222, TNM.scala:12-18)."""
    col = _col(batch, rule.params["col"])
    pattern = rule.params["pattern"]
    if rule.params.get("full_match", True) and not pattern.startswith("^"):
        pattern = f"^(?:{pattern})$"
    ok = pc.match_substring_regex(pc.fill_null(col, ""), pattern)
    bad = pc.and_(pc.invert(ok), pc.is_valid(col))
    if rule.params.get("negate"):
        bad = pc.and_(ok, pc.is_valid(col))
    return _as_numpy_bool(bad)


def k_range(batch: pa.Table, rule: Rule, ctx: RuleContext) -> np.ndarray:
    """`must be (in ClosedInterval(lo, hi))` (MTBValidators.scala:363,
    :442-444).  Open bounds via lo/hi = None."""
    col = _col(batch, rule.params["col"])
    lo, hi = rule.params.get("lo"), rule.params.get("hi")
    bad = pa.array(np.zeros(len(batch), dtype=bool))
    if lo is not None:
        bad = pc.or_(bad, pc.less(col, lo))
    if hi is not None:
        bad = pc.or_(bad, pc.greater(col, hi))
    return _as_numpy_bool(pc.and_(bad, pc.is_valid(col)))


def k_equality(batch: pa.Table, rule: Rule, ctx: RuleContext) -> np.ndarray:
    """`must be (expectedValue)` (MTBValidators.scala:369-371); with
    ``forbidden`` instead of ``expected``, violated on equality (sentinel
    rejection)."""
    col = _col(batch, rule.params["col"])
    if "forbidden" in rule.params:
        bad = pc.equal(col, rule.params["forbidden"])
    else:
        bad = pc.invert(pc.equal(col, rule.params["expected"]))
    return _as_numpy_bool(pc.and_(bad, pc.is_valid(col)))


def k_either_or(batch: pa.Table, rule: Rule, ctx: RuleContext) -> np.ndarray:
    """Either-or presence: at least one of ``cols`` defined
    (tumorStagingValidator TNM ∨ other classifications,
    MTBValidators.scala:211-217)."""
    missing_all = np.ones(len(batch), dtype=bool)
    for c in rule.params["cols"]:
        missing_all &= _as_numpy_bool(pc.is_null(_col(batch, c)))
    return missing_all


def k_conditional_presence(batch: pa.Table, rule: Rule, ctx: RuleContext) -> np.ndarray:
    """Status-conditional dispatch: ``when_col == when_value ⇒ col
    defined`` (MTBTherapyValidator's per-status requirements,
    MTBValidators.scala:279-320)."""
    when = pc.equal(_col(batch, rule.params["when_col"]), rule.params["when_value"])
    missing = k_presence(batch, Rule("_", "presence", "e", "/", {"col": rule.params["col"]}), ctx)
    return _as_numpy_bool(when) & missing


def k_conditional_dispatch(batch: pa.Table, rule: Rule, ctx: RuleContext) -> np.ndarray:
    """Full status-conditional dispatch: ``cases`` maps each value of
    ``when_col`` to the columns that value requires present — the
    reference's MTBTherapyValidator, where Ongoing/Completed/Stopped
    each imply a different requirement set
    (MTBValidators.scala:279-320).  Violated where the row's status has
    a case and any of its required columns is missing."""
    when = _col(batch, rule.params["when_col"])
    out = np.zeros(len(batch), dtype=bool)
    for case_value, required_cols in rule.params["cases"].items():
        case_mask = _as_numpy_bool(pc.equal(when, case_value))
        if not case_mask.any():
            continue
        missing_any = np.zeros(len(batch), dtype=bool)
        for col in required_cols:
            missing_any |= k_presence(
                batch, Rule("_", "presence", "e", "/", {"col": col}), ctx
            )
        out |= case_mask & missing_any
    return out


def k_list_value_set(
    batch: pa.Table, rule: Rule, ctx: RuleContext
) -> tuple[np.ndarray, np.ndarray]:
    """`validateEach(xs)` with list-index path segments: every element
    of the (separator-split) list column must be in the value set; each
    bad element yields its own violation at ``path/<label>[i]``
    (the reference's each-germline-code-valid loop,
    MTBValidators.scala:241, with Path list indices).

    Returns (row_indices, element_indices) of violating elements — the
    dynamic-path kernel contract (LIST_KERNELS)."""
    col = _col(batch, rule.params["col"])
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    sep = rule.params.get("sep", " ")
    valid_rows = _as_numpy_bool(pc.is_valid(col))
    split = pc.split_pattern(pc.fill_null(col, ""), sep)
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    flat = pc.list_flatten(split)
    parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    bad = _as_numpy_bool(
        pc.invert(pc.is_in(flat, value_set=ctx.value_array(rule)))
    )
    bad &= valid_rows[parent]
    offsets = split.offsets.to_numpy(zero_copy_only=False)
    elem_idx = np.arange(len(flat), dtype=np.int64) - offsets[parent]
    return parent[bad], elem_idx[bad]


def k_raw_len(batch: pa.Table, rule: Rule, ctx: RuleContext) -> np.ndarray:
    """Cross-field derived check: fmt=='raw' ⇒ len(bytes) == w*h*3
    (engine analog of derived-duration ≥ 0, MTBValidators.scala:245-247,
    :312-317)."""
    is_raw = _as_numpy_bool(pc.equal(_col(batch, "fmt"), "raw"))
    blen = _as_numpy_bool(
        pc.not_equal(
            pc.binary_length(pc.fill_null(_col(batch, "bytes"), b"")),
            pc.multiply(
                pc.multiply(
                    pc.cast(pc.fill_null(_col(batch, "w"), 0), pa.int64()),
                    pc.cast(pc.fill_null(_col(batch, "h"), 0), pa.int64()),
                ),
                pa.scalar(3, pa.int64()),
            ),
        )
    )
    return is_raw & blen


def k_ref_member(batch: pa.Table, rule: Rule, ctx: RuleContext) -> np.ndarray:
    """Referential resolvability against a broadcast key set — the
    reference's supportingFindings Reference-resolution check, Fatal on
    dangling (MTBValidators.scala:563-568).  The key set ships via
    ``ctx.broadcast[params['refset']]`` (ray.put once, read per actor).

    ``key_fn='first_word_lower'`` extracts the caption key."""
    col = _col(batch, rule.params["col"])
    key_fn = rule.params.get("key_fn")
    if key_fn == "first_word_lower":
        keys = pc.utf8_lower(
            pc.list_element(pc.split_pattern(pc.fill_null(col, ""), " "), 0)
        )
    else:
        keys = pc.fill_null(col, "")
    refset = ctx.broadcast[rule.params["refset"]]
    if not isinstance(refset, pa.Array):
        refset = pa.array(sorted(refset), pa.string())
    ok = pc.is_in(keys, value_set=refset)
    return _as_numpy_bool(pc.and_(pc.invert(ok), pc.is_valid(col)))


def k_caption_len(batch: pa.Table, rule: Rule, ctx: RuleContext) -> np.ndarray:
    """Advisory minimum-length check on a string column (info tier)."""
    col = _col(batch, rule.params["col"])
    short = pc.less(pc.utf8_length(col), rule.params.get("min_len", 8))
    return _as_numpy_bool(pc.and_(short, pc.is_valid(col)))


KERNELS: dict[str, Callable[[pa.Table, Rule, RuleContext], np.ndarray]] = {
    "presence": k_presence,
    "value_set": k_value_set,
    "regex": k_regex,
    "range": k_range,
    "equality": k_equality,
    "either_or": k_either_or,
    "conditional_presence": k_conditional_presence,
    "conditional_dispatch": k_conditional_dispatch,
    "raw_len": k_raw_len,
    "ref_member": k_ref_member,
    "caption_len": k_caption_len,
}

# dynamic-path kernels: (batch, rule, ctx) -> (row_indices, element_indices);
# each violating element emits its own issue at `path/<elem_label>[i]`
LIST_KERNELS: dict[str, Callable[[pa.Table, "Rule", "RuleContext"], tuple]] = {
    "list_value_set": k_list_value_set,
}

# kernels that need the bytes column / decoded pixels — these run in the
# decode pass (stages/decode_pass.py, the only pass that reads `bytes`),
# not the metadata pass.  "raw_len" stays vectorized there.
DECODE_KINDS = frozenset({"magic_fmt", "pixel_integrity", "raw_len"})


def register_kernel(name: str, fn: Callable) -> None:
    """User-extension surface for custom vectorized kernels (SPI analog)."""
    KERNELS[name] = fn


_KIND_COLUMNS = {
    "raw_len": {"bytes", "w", "h", "fmt"},
    "magic_fmt": {"bytes", "w", "h", "fmt"},
    "pixel_integrity": {"bytes", "w", "h", "fmt", "phash"},
}


def rule_columns(rule: Rule) -> set[str]:
    """Input columns a rule reads — drives per-pass column pruning (the
    decode pass is the only one that ever reads ``bytes``)."""
    cols = set(_KIND_COLUMNS.get(rule.kind, ()))
    for key in ("col", "when_col"):
        if key in rule.params:
            cols.add(rule.params[key])
    cols.update(rule.params.get("cols", ()))
    for required in rule.params.get("cases", {}).values():
        cols.update(required)
    return cols


def rule_needs_bytes(rule: Rule) -> bool:
    return "bytes" in rule_columns(rule)


def evaluate_rules(
    batch: pa.Table,
    ctx: RuleContext,
    *,
    emit: Callable[[Rule], bool] | None = None,
    record_id_col: str = "record_id",
) -> tuple[pa.Table, dict[str, np.ndarray]]:
    """Run every vectorized rule whose columns are present in the batch,
    honoring ``requires`` gating; returns (violations, fired masks).

    Accumulates all issues per record (never short-circuits within a
    record) — ValidatedNel semantics, MTBValidators.scala:7.  ``emit``
    restricts which rules *report* violations (a pass evaluates shared
    prerequisites for gating but only emits the rules it owns)."""
    if record_id_col not in batch.column_names and "image_id" in batch.column_names:
        record_id_col = "image_id"
    record_ids = batch.column(record_id_col)
    partition_ids = (
        batch.column(PARTITION_COL)
        if PARTITION_COL in batch.column_names
        else pa.nulls(len(batch), pa.int32())
    )
    available = set(batch.column_names)
    fired: dict[str, np.ndarray] = {}
    out: list[pa.Table] = []
    for rule in ctx.ruleset.rules:
        if rule.kind in LIST_KERNELS:
            if not rule_columns(rule) <= available:
                continue
            rows, elems = LIST_KERNELS[rule.kind](batch, rule, ctx)
            for prereq in rule.requires:
                if prereq in fired and len(rows):
                    keep = ~fired[prereq][rows]
                    rows, elems = rows[keep], elems[keep]
            mask = np.zeros(len(batch), dtype=bool)
            if len(rows):
                mask[rows] = True
            fired[rule.rule_id] = mask
            if emit is not None and not emit(rule):
                continue
            if len(rows):
                label = rule.params.get("elem_label", "item")
                paths = [f"{rule.path}/{label}[{int(e)}]" for e in elems]
                out.append(
                    violations_table(
                        record_ids.take(pa.array(rows)),
                        rule.rule_id, rule.severity, paths,
                        rule.render_message(),
                        partition_ids.take(pa.array(rows)),
                    )
                )
            continue
        if rule.kind not in KERNELS or not rule_columns(rule) <= available:
            continue
        mask = KERNELS[rule.kind](batch, rule, ctx)
        for prereq in rule.requires:
            if prereq in fired:
                mask = mask & ~fired[prereq]
        fired[rule.rule_id] = mask
        if emit is not None and not emit(rule):
            continue
        if mask.any():
            idx = np.nonzero(mask)[0]
            out.append(
                violations_table(
                    record_ids.take(pa.array(idx)),
                    rule.rule_id,
                    rule.severity,
                    rule.path,
                    rule.render_message(),
                    partition_ids.take(pa.array(idx)),
                )
            )
    if not out:
        return VIOLATION_SCHEMA.empty_table(), fired
    return pa.concat_tables(out), fired


def evaluate_row_rules(
    batch: pa.Table, ctx: RuleContext, *, record_id_col: str = "record_id"
) -> pa.Table:
    """Metadata-pass entry: evaluate + emit every rule that does NOT
    read the payload column."""
    violations, _ = evaluate_rules(
        batch, ctx, emit=lambda r: not rule_needs_bytes(r), record_id_col=record_id_col
    )
    return violations
