"""End-to-end golden tests: valid fixture ⇒ zero violations; corrupted
fixture ⇒ exactly the golden violation rows (FIXTURES.md §3/§4) — the
engine's upgrade of the reference's invalidator tests
(Tests.scala:45-56, Invalidators.scala:25-109) to row-for-row equality.
Also cross-checks the Ray pipeline against a single-process pyarrow
oracle at a different parallelism."""

import pyarrow as pa
import pytest

from mtb_validation_service_ray.pipelines.validate import run_validation
from mtb_validation_service_ray.rules.core import RuleContext, evaluate_rules
from mtb_validation_service_ray.rules.registry import default_image_ruleset
from mtb_validation_service_ray.sources.fixtures import (
    CAPTION_KEYS,
    annotations_table,
    corrupted_fixture,
    golden_table,
    make_image_rows,
)
from mtb_validation_service_ray.stages.decode_pass import DecodePass


def _sorted_df(violations_ds):
    df = violations_ds.to_pandas()[["record_id", "rule_id", "severity", "path"]]
    return df.sort_values(["record_id", "rule_id"]).reset_index(drop=True)


def test_valid_fixture_is_clean():
    table = make_image_rows(0, 200, seed=42, total=200)
    res = run_validation(table, annotations=annotations_table(table))
    assert res.violations.count() == 0
    verdicts = res.verdicts.to_pandas()
    assert len(verdicts) == 200
    assert (verdicts["verdict"] == "pass").all()
    assert verdicts["accepted"].all()


@pytest.fixture(scope="module")
def corrupted():
    c = corrupted_fixture(300)
    dropped = c.table.column("image_id")[150].as_py()
    ann = annotations_table(c.table, drop_ids=[dropped])
    res = run_validation(c.table, annotations=ann)
    return c, dropped, res, res.violations.to_pandas()


def test_golden_row_for_row(corrupted):
    c, dropped, res, viol_df = corrupted
    got = (
        viol_df[["record_id", "rule_id", "severity", "path"]]
        .sort_values(["record_id", "rule_id"])
        .reset_index(drop=True)
    )
    golden = golden_table(c).to_pandas()
    golden.loc[len(golden)] = [dropped, "R-REF-ORPHAN", "warning", "/record"]
    golden = golden.sort_values(["record_id", "rule_id"]).reset_index(drop=True)
    pa_got = pa.Table.from_pandas(got)
    pa_exp = pa.Table.from_pandas(golden)
    assert pa_got.equals(pa_exp), f"\ngot:\n{got}\nexpected:\n{golden}"


def test_verdict_rollup_and_fatal_rejection(corrupted):
    c, dropped, res, viol_df = corrupted
    verdicts = res.verdicts.to_pandas().set_index("record_id")
    # fatal records rejected (FatalIssuesDetected analog, Tests.scala:45-56)
    fatal_ids = set(viol_df[viol_df.severity == "fatal"].record_id)
    assert fatal_ids
    for rid in fatal_ids:
        assert verdicts.loc[rid, "verdict"] == "fatal"
        assert not verdicts.loc[rid, "accepted"]
    # max-severity roll-up
    worst = viol_df.groupby("record_id").severity.apply(
        lambda s: max(s, key=["info", "warning", "error", "fatal"].index)
    )
    for rid, sev in worst.items():
        assert verdicts.loc[rid, "verdict"] == sev
    # untouched records pass
    n_rows = c.table.num_rows
    touched = set(viol_df.record_id)
    assert (verdicts.drop(index=touched)["verdict"] == "pass").all()
    assert len(verdicts) == n_rows - 1  # duplicate id collapses to one verdict


def test_partition_report(corrupted):
    c, dropped, res, viol_df = corrupted
    report = res.partition_report().to_pandas().set_index("partition_id")
    fatal_pids = set(viol_df[viol_df.severity == "fatal"].partition_id)
    for pid in report.index:
        expected = "fail" if pid in fatal_pids else "pass"
        assert report.loc[pid, "status"] == expected
    assert report["n_records"].sum() == c.table.num_rows - 1


def test_pyarrow_oracle_matches_ray(corrupted):
    """Single-process oracle: same kernels, one batch, no Ray — must
    produce identical row-local violations (FIXTURES.md §4)."""
    c, dropped, res, viol_df = corrupted
    rs = default_image_ruleset()
    ctx = RuleContext(rs, broadcast={"caption_refs": frozenset(CAPTION_KEYS)})
    from mtb_validation_service_ray.stages.decode_pass import DECODE_COLUMNS

    meta_cols = [n for n in c.table.column_names if n != "bytes"]
    meta_v, _ = evaluate_rules(c.table.select(meta_cols), ctx)
    decode_v = DecodePass(rs)(c.table.select(DECODE_COLUMNS))
    oracle = pa.concat_tables([meta_v, decode_v]).to_pandas()
    oracle = (
        oracle[["record_id", "rule_id", "severity", "path"]]
        .sort_values(["record_id", "rule_id"])
        .reset_index(drop=True)
    )
    ray_rowlocal = (
        viol_df[~viol_df.rule_id.isin(["R-UQ-ID", "R-REF-ORPHAN", "R-TAIL-EITHER"])][
            ["record_id", "rule_id", "severity", "path"]
        ]
        .sort_values(["record_id", "rule_id"])
        .reset_index(drop=True)
    )
    assert oracle.equals(ray_rowlocal)


def test_schema_conformance():
    from mtb_validation_service_ray.schema import check_schema

    table = make_image_rows(0, 5)
    assert check_schema(table.schema) == []
    bad = table.drop_columns(["phash"]).add_column(
        0, "w2", table.column("w").cast(pa.int64())
    )
    problems = check_schema(bad.schema, strict=True)
    assert any("phash" in p for p in problems)
    assert any("w2" in p for p in problems)


def test_untouched_rows_pixel_invariant():
    """FIXTURES.md §4: rows untouched by mutators decode to exactly the
    generator's pixels (raw/png) or within the PSNR≥40dB budget (lossy),
    and captions equal the pre-corruption table."""
    import numpy as np

    from mtb_validation_service_ray.functions import codec
    from mtb_validation_service_ray.sources.fixtures import corrupted_fixture

    c = corrupted_fixture(200)
    original = make_image_rows(0, 200, seed=42, total=200)
    for row in range(200):
        if row in c.touched_rows:
            continue
        fmt = c.table.column("fmt")[row].as_py()
        w = c.table.column("w")[row].as_py()
        h = c.table.column("h")[row].as_py()
        decoded = codec.decode(c.table.column("bytes")[row].as_py(), fmt, w, h)
        reference = codec.decode(original.column("bytes")[row].as_py(), fmt, w, h)
        if fmt in ("raw", "png"):
            assert np.array_equal(decoded, reference)
        else:
            assert codec.psnr(decoded, reference) >= 40.0
        assert (
            c.table.column("caption")[row].as_py()
            == original.column("caption")[row].as_py()
        )
