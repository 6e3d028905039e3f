"""Rule-kernel unit tests (no Ray): each vectorized kernel against a
single-process pyarrow batch, plus gating and id-pattern conformance."""

import pyarrow as pa
import pytest

from mtb_validation_service_ray.rules.core import (
    Rule,
    RuleContext,
    RuleSet,
    evaluate_rules,
    rule_needs_bytes,
)
from mtb_validation_service_ray.rules.registry import (
    IMAGE_ID_PATTERN,
    default_image_ruleset,
)


def _ctx(rules, broadcast=None):
    return RuleContext(RuleSet(list(rules), name="t"), broadcast=broadcast or {})


def _violations(batch, ctx, **kw):
    v, _ = evaluate_rules(batch, ctx, **kw)
    return v


def test_presence_null_and_empty():
    batch = pa.table({"record_id": ["a", "b", "c"], "x": ["v", None, ""]})
    ctx = _ctx([Rule("P", "presence", "warning", "/x", {"col": "x"})])
    v = _violations(batch, ctx)
    assert v.column("record_id").to_pylist() == ["b", "c"]
    assert set(v.column("severity").to_pylist()) == {"warning"}


def test_value_set_ignores_nulls():
    batch = pa.table({"record_id": ["a", "b", "c"], "x": ["ok", "bad", None]})
    ctx = _ctx([Rule("V", "value_set", "error", "/x", {"col": "x", "values": {"ok"}})])
    assert _violations(batch, ctx).column("record_id").to_pylist() == ["b"]


def test_regex_full_match_anchored():
    batch = pa.table(
        {"record_id": ["a", "b", "c"], "x": ["img-" + "0" * 16, "ximg-" + "0" * 16, "img-XYZ"]}
    )
    ctx = _ctx([Rule("R", "regex", "error", "/x", {"col": "x", "pattern": IMAGE_ID_PATTERN})])
    assert _violations(batch, ctx).column("record_id").to_pylist() == ["b", "c"]


def test_range_closed_interval():
    batch = pa.table({"record_id": list("abcde"), "x": [0, 1, 8, 10, 11]})
    ctx = _ctx([Rule("G", "range", "error", "/x", {"col": "x", "lo": 1, "hi": 10})])
    assert _violations(batch, ctx).column("record_id").to_pylist() == ["a", "e"]


def test_equality_forbidden_sentinel():
    batch = pa.table({"record_id": ["a", "b"], "x": [0, 5]})
    ctx = _ctx([Rule("E", "equality", "warning", "/x", {"col": "x", "forbidden": 0})])
    assert _violations(batch, ctx).column("record_id").to_pylist() == ["a"]


def test_either_or():
    batch = pa.table(
        {"record_id": ["a", "b", "c"], "x": ["v", None, None], "y": [None, 1, None]}
    )
    ctx = _ctx([Rule("EO", "either_or", "warning", "/", {"cols": ["x", "y"]})])
    assert _violations(batch, ctx).column("record_id").to_pylist() == ["c"]


def test_conditional_presence():
    batch = pa.table(
        {
            "record_id": ["a", "b", "c"],
            "status": ["stopped", "stopped", "ongoing"],
            "reason": [None, "r", None],
        }
    )
    ctx = _ctx(
        [
            Rule(
                "C",
                "conditional_presence",
                "warning",
                "/reason",
                {"when_col": "status", "when_value": "stopped", "col": "reason"},
            )
        ]
    )
    assert _violations(batch, ctx).column("record_id").to_pylist() == ["a"]


def test_ref_member_broadcast_and_key_fn():
    batch = pa.table(
        {"record_id": ["a", "b", "c"], "cap": ["Red cat", "zzz dog", None]}
    )
    ctx = _ctx(
        [
            Rule(
                "F",
                "ref_member",
                "fatal",
                "/cap",
                {"col": "cap", "refset": "keys", "key_fn": "first_word_lower"},
            )
        ],
        broadcast={"keys": frozenset({"red"})},
    )
    assert _violations(batch, ctx).column("record_id").to_pylist() == ["b"]


def test_and_then_gating_suppresses_children():
    """A failed precondition masks its dependents for that row only
    (MTBValidators.scala:243,252-254)."""
    batch = pa.table({"record_id": ["a", "b"], "x": [None, "BAD"]})
    rules = [
        Rule("P", "presence", "error", "/x", {"col": "x"}),
        Rule("R", "regex", "error", "/x", {"col": "x", "pattern": "[a-z]+"},
             requires=("P",)),
    ]
    v = _violations(batch, _ctx(rules))
    got = sorted(zip(v.column("record_id").to_pylist(), v.column("rule_id").to_pylist()))
    # row a: only P (R gated); row b: only R (P passed)
    assert got == [("a", "P"), ("b", "R")]


def test_issue_accumulation_no_short_circuit():
    """Multiple failures on one record all surface (ValidatedNel)."""
    batch = pa.table({"record_id": ["a"], "x": [None], "y": [0]})
    rules = [
        Rule("P", "presence", "error", "/x", {"col": "x"}),
        Rule("G", "range", "error", "/y", {"col": "y", "lo": 1, "hi": 9}),
    ]
    v = _violations(batch, _ctx(rules))
    assert sorted(v.column("rule_id").to_pylist()) == ["G", "P"]


def test_default_ruleset_wellformed():
    rs = default_image_ruleset()
    ids = [r.rule_id for r in rs.rules]
    assert len(ids) == len(set(ids))
    by_id = set(ids)
    for r in rs.rules:
        for dep in r.requires:
            assert dep in by_id, f"{r.rule_id} requires unknown {dep}"
    assert rs.content_hash() == default_image_ruleset().content_hash()
    # payload rules properly classified
    assert {r.rule_id for r in rs.rules if rule_needs_bytes(r)} == {
        "R-PR-BYTES", "R-XF-LEN", "R-XF-MAGIC", "R-XF-PSNR",
    }


def test_ruleset_plugins_and_hash_changes():
    rs = RuleSet.from_plugins("image-default")
    assert len(rs.rules) == len(default_image_ruleset().rules)
    pruned = rs.without("R-RG-PHASH")
    assert pruned.content_hash() != rs.content_hash()


@pytest.mark.parametrize(
    "good",
    ["img-0000000000000000", "img-abcdef0123456789", "img-ffffffffffffffff"],
)
def test_id_pattern_conformance_good(good):
    import re

    assert re.fullmatch(IMAGE_ID_PATTERN, good)


@pytest.mark.parametrize(
    "bad",
    ["IMG-0000000000000000", "img-00", "img_abcdef0123456789",
     "img-ABCDEF0123456789", "img-abcdef012345678", " img-abcdef0123456789"],
)
def test_id_pattern_conformance_bad(bad):
    import re

    assert not re.fullmatch(IMAGE_ID_PATTERN, bad)


def test_conditional_dispatch_cases():
    """Status-conditional dispatch (MTBValidators.scala:279-320 analog):
    each when-value implies its own requirement set."""
    batch = pa.table(
        {
            "record_id": ["a", "b", "c", "d", "e"],
            "fmt": ["png", "png", "lossy", "lossy", "raw"],
            "phash": pa.array([1, None, 5, None, None], pa.int64()),
            "caption": ["x long enough", None, None, "ok caption", None],
        }
    )
    ctx = _ctx([
        Rule("COND", "conditional_dispatch", "error", "/fmt/conditional",
             {"when_col": "fmt",
              "cases": {"png": ["phash"], "lossy": ["caption", "phash"]}}),
    ])
    v = _violations(batch, ctx)
    # b: png missing phash; c: lossy missing caption; d: lossy missing
    # phash; e: raw has no case → never fires
    assert v.column("record_id").to_pylist() == ["b", "c", "d"]


def test_conditional_dispatch_gated_by_value_set():
    batch = pa.table(
        {
            "record_id": ["a", "b"],
            "fmt": ["nonsense", "png"],
            "phash": pa.array([None, None], pa.int64()),
        }
    )
    ctx = _ctx([
        Rule("VS", "value_set", "error", "/fmt", {"col": "fmt", "values": {"png"}}),
        Rule("COND", "conditional_dispatch", "error", "/fmt/conditional",
             {"when_col": "fmt", "cases": {"png": ["phash"], "nonsense": ["phash"]}},
             requires=("VS",)),
    ])
    v = _violations(batch, ctx)
    got = list(zip(v.column("record_id").to_pylist(), v.column("rule_id").to_pylist()))
    # a fails the value set → conditional suppressed (andThen); b fires
    assert got == [("a", "VS"), ("b", "COND")]


def test_list_value_set_dynamic_index_paths():
    """validateEach: per-element issues with list-index path segments."""
    batch = pa.table(
        {
            "record_id": ["a", "b", "c"],
            "caption": ["red cat sits", "red dances cat wobbles", None],
        }
    )
    ctx = _ctx([
        Rule("VSL", "list_value_set", "warning", "/caption",
             {"col": "caption", "values": {"red", "cat", "sits"},
              "elem_label": "words"}),
    ])
    v = _violations(batch, ctx)
    assert v.column("record_id").to_pylist() == ["b", "b"]
    assert v.column("path").to_pylist() == ["/caption/words[1]", "/caption/words[3]"]


def test_list_value_set_gating():
    """An element rule is suppressed on rows where its prerequisite
    already fired (andThen semantics for validateEach)."""
    batch = pa.table(
        {
            "record_id": ["a", "b"],
            "caption": ["bad\x01words here", "red zz"],
        }
    )
    ctx = _ctx([
        Rule("RE", "regex", "warning", "/caption/charset",
             {"col": "caption", "pattern": "[\\x20-\\x7E]+"}),
        Rule("VSL", "list_value_set", "warning", "/caption",
             {"col": "caption", "values": {"red"}, "elem_label": "words"},
             requires=("RE",)),
    ])
    v = _violations(batch, ctx)
    got = list(zip(v.column("record_id").to_pylist(), v.column("rule_id").to_pylist(),
                   v.column("path").to_pylist()))
    assert got == [("a", "RE", "/caption/charset"), ("b", "VSL", "/caption/words[1]")]


def test_path_composition_at():
    """`validate … at "seg"` hierarchical re-rooting on Rule and RuleSet."""
    r = Rule("X", "presence", "error", "/caption/charset", {"col": "caption"})
    assert r.at("record").path == "/record/caption/charset"
    assert r.at("a", "b").path == "/a/b/caption/charset"
    rs = RuleSet([r], name="t").at("record")
    assert rs.rules[0].path == "/record/caption/charset"
    # default registry is fully hierarchical: every path has >= 2 segments
    for rule in default_image_ruleset().rules:
        assert rule.path.startswith("/record")


def test_permissions_spi_round_trip():
    """PermissionTests.scala analog: the SPI yields a non-empty set and
    every printed permission name parses back to its permission."""
    from mtb_validation_service_ray.rules.permissions import (
        IMAGE_VALIDATION_PERMISSIONS,
        get_permissions,
        register_permissions,
        validation_roles,
        PermissionSet,
    )

    perms = get_permissions("image-validation")  # SPI must have worked
    assert perms is IMAGE_VALIDATION_PERMISSIONS
    assert len(perms.all()) > 0  # permission set non-empty
    # name round-trip: parse(p.name) recovers exactly the set
    assert {perms.parse(p.name) for p in perms} == set(perms.all())
    assert perms.parse("other-domain:read_validation_report") is None
    # roles: viewer ⊂ validator, revalidate is validator-only
    roles = validation_roles(perms)
    assert roles["viewer"].permissions < roles["validator"].permissions
    reval = perms.parse("image-validation:revalidate")
    assert reval in roles["validator"] and reval not in roles["viewer"]
    # foreign providers register through the same SPI
    register_permissions("other", lambda: PermissionSet("other"))
    assert get_permissions("other").domain == "other"
