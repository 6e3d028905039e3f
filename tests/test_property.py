"""Property-based kernel equivalence (reference test-strategy parity).

The reference tests with GENERATOR-BASED randomized records + mutators
(Gen.of[MTBPatientRecord], Tests.scala:26-31).  Here hypothesis
generates random metadata batches (nulls, empties, unicode, extreme
values) and every vectorized kernel is checked row-for-row against an
independent pure-Python per-row reimplementation of the rule semantics
— the same double-implementation discipline as the DuckDB oracles, at
the kernel level.
"""

from __future__ import annotations

import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from mtb_validation_service_ray.rules.core import (
    Rule,
    RuleContext,
    RuleSet,
    evaluate_rules,
)

FMTS = ["png", "raw", "lossy", "webp?", None]
CAPTIONS = st.one_of(
    st.none(),
    st.just(""),
    st.text(
        alphabet=st.characters(
            whitelist_categories=(), whitelist_characters="".join(
                [chr(c) for c in range(0x20, 0x7F)]
                + [chr(c) for c in range(0x1, 0x9)]
                + [chr(c) for c in range(0xA1, 0x180)]
            )
        ),
        max_size=24,
    ),
    st.sampled_from(["red cat sits", "red cat", "zz unknown words here"]),
)

ROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.just(""), st.text(alphabet="abcdef0123456789-img", max_size=24)),
        st.one_of(st.none(), st.integers(min_value=-5, max_value=20000)),
        st.one_of(st.none(), st.integers(min_value=-5, max_value=20000)),
        st.sampled_from(FMTS),
        CAPTIONS,
        st.one_of(st.none(), st.integers(min_value=-3, max_value=3)),
    ),
    min_size=0,
    max_size=60,
)


def _batch(rows) -> pa.Table:
    return pa.table(
        {
            "record_id": pa.array([f"r{i}" for i in range(len(rows))], pa.string()),
            "image_id": pa.array([r[0] for r in rows], pa.string()),
            "w": pa.array([r[1] for r in rows], pa.int32()),
            "h": pa.array([r[2] for r in rows], pa.int32()),
            "fmt": pa.array([r[3] for r in rows], pa.string()),
            "caption": pa.array([r[4] for r in rows], pa.string()),
            "phash": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


ID_PATTERN = re.compile(r"^(?:img-[0-9a-f]{16})$")
CAP_PATTERN = re.compile("^(?:[\\x20-\\x7E¡-￿]+)$")
VOCAB = {"red", "cat", "sits"}
KEYS = {"red"}
FMT_SET = {"png", "raw", "lossy"}


def _missing(v) -> bool:
    return v is None or v == "" or v == b""


def reference_eval(rows) -> list[tuple[str, str]]:
    """Independent per-row re-implementation of the rule battery
    (presence, value-set, regex, range, forbidden-equality, either-or,
    conditional dispatch, ref-member, caption-length, list value-set
    with index paths, all with andThen gating)."""
    out: list[tuple[str, str]] = []
    for i, (iid, w, h, fmt, cap, ph) in enumerate(rows):
        rid = f"r{i}"
        fired: set[str] = set()

        def emit(rule_id, path):
            out.append((rid, f"{rule_id}@{path}"))
            fired.add(rule_id)

        if _missing(iid):
            emit("P-ID", "/id")
        if _missing(cap):
            emit("P-CAP", "/cap")
        if cap is None and ph is None:
            emit("P-EITHER", "/")
        if fmt is not None and fmt not in FMT_SET:
            emit("VS-FMT", "/fmt")
        if "P-ID" not in fired and iid is not None and not ID_PATTERN.match(iid):
            emit("RE-ID", "/id/format")
        if "P-CAP" not in fired and cap is not None and not CAP_PATTERN.match(cap):
            emit("RE-CAP", "/cap/charset")
        if w is not None and (w < 1 or w > 16384):
            emit("RG-W", "/w")
        if ph is not None and ph == 0:
            emit("RG-PH", "/ph")
        if "P-CAP" not in fired and cap is not None and len(cap) < 8:
            emit("LEN-CAP", "/cap/length")
        if "VS-FMT" not in fired and (
            (fmt == "png" and ph is None)
            or (fmt == "lossy" and (ph is None or _missing(cap)))
        ):
            emit("COND", "/fmt/conditional")
        key_ok = None
        if "P-CAP" not in fired and cap is not None:
            key = cap.split(" ")[0].lower() if cap else ""
            key_ok = key in KEYS
            if not key_ok:
                emit("REF-CAP", "/cap/key")
        if (
            "P-CAP" not in fired
            and "RE-CAP" not in fired
            and "REF-CAP" not in fired
            and cap is not None
        ):
            for j, word in enumerate(cap.split(" ")):
                if word not in VOCAB:
                    out.append((rid, f"VSL@/cap/words[{j}]"))
    return sorted(out)


def _ruleset() -> RuleSet:
    rs = RuleSet(name="prop")
    rs.add(Rule("P-ID", "presence", "error", "/id", {"col": "image_id"}))
    rs.add(Rule("P-CAP", "presence", "warning", "/cap", {"col": "caption"}))
    rs.add(Rule("P-EITHER", "either_or", "warning", "/", {"cols": ["caption", "phash"]}))
    rs.add(Rule("VS-FMT", "value_set", "error", "/fmt",
                {"col": "fmt", "values": FMT_SET}))
    rs.add(Rule("RE-ID", "regex", "error", "/id/format",
                {"col": "image_id", "pattern": r"img-[0-9a-f]{16}"},
                requires=("P-ID",)))
    rs.add(Rule("RE-CAP", "regex", "warning", "/cap/charset",
                {"col": "caption", "pattern": "[\\x20-\\x7E¡-￿]+"},
                requires=("P-CAP",)))
    rs.add(Rule("RG-W", "range", "error", "/w", {"col": "w", "lo": 1, "hi": 16384}))
    rs.add(Rule("RG-PH", "equality", "warning", "/ph",
                {"col": "phash", "forbidden": 0}))
    rs.add(Rule("LEN-CAP", "caption_len", "info", "/cap/length",
                {"col": "caption", "min_len": 8}, requires=("P-CAP",)))
    rs.add(Rule("COND", "conditional_dispatch", "error", "/fmt/conditional",
                {"when_col": "fmt",
                 "cases": {"png": ["phash"], "lossy": ["caption", "phash"]}},
                requires=("VS-FMT",)))
    rs.add(Rule("REF-CAP", "ref_member", "fatal", "/cap/key",
                {"col": "caption", "refset": "caption_refs",
                 "key_fn": "first_word_lower"},
                requires=("P-CAP",)))
    rs.add(Rule("VSL", "list_value_set", "warning", "/cap",
                {"col": "caption", "values": VOCAB, "elem_label": "words"},
                requires=("P-CAP", "RE-CAP", "REF-CAP")))
    return rs


@settings(max_examples=200, deadline=None)
@given(ROWS)
def test_kernels_match_reference_eval(rows):
    ctx = RuleContext(_ruleset(), broadcast={"caption_refs": frozenset(KEYS)})
    violations, _ = evaluate_rules(_batch(rows), ctx)
    got = sorted(
        zip(
            violations.column("record_id").to_pylist(),
            [
                f"{r}@{p}"
                for r, p in zip(
                    violations.column("rule_id").to_pylist(),
                    violations.column("path").to_pylist(),
                )
            ],
        )
    )
    assert got == reference_eval(rows)
