"""Fused single-read pipeline must produce exactly the same golden
violations and verdicts as the modular pipeline."""

import pyarrow as pa

from mtb_validation_service_ray.pipelines.validate import (
    run_validation,
    run_validation_fused,
)
from mtb_validation_service_ray.sources.fixtures import (
    annotations_table,
    corrupted_fixture,
    golden_table,
)


def _key_df(violations_ds):
    df = violations_ds.to_pandas()[["record_id", "rule_id", "severity", "path"]]
    return df.sort_values(["record_id", "rule_id"]).reset_index(drop=True)


def test_fused_matches_golden_and_modular():
    c = corrupted_fixture(400)
    dropped = c.table.column("image_id")[200].as_py()
    ann = annotations_table(c.table, drop_ids=[dropped])

    fused = run_validation_fused(c.table, annotations=ann)
    modular = run_validation(c.table, annotations=ann)

    f_df, m_df = _key_df(fused.violations), _key_df(modular.violations)
    assert f_df.equals(m_df), f"\nfused:\n{f_df}\nmodular:\n{m_df}"

    golden = golden_table(c).to_pandas()
    golden.loc[len(golden)] = [dropped, "R-REF-ORPHAN", "warning", "/record"]
    golden = golden.sort_values(["record_id", "rule_id"]).reset_index(drop=True)
    assert pa.Table.from_pandas(f_df).equals(pa.Table.from_pandas(golden))

    fv = fused.verdicts.to_pandas().set_index("record_id").sort_index()
    mv = modular.verdicts.to_pandas().set_index("record_id").sort_index()
    assert fv["verdict"].equals(mv["verdict"])
    assert fv["accepted"].equals(mv["accepted"])
    assert len(fv) == c.table.num_rows - 1  # duplicate id collapses


def test_fused_clean_input():
    from mtb_validation_service_ray.sources.fixtures import make_image_rows

    t = make_image_rows(0, 150, seed=9, total=150)
    res = run_validation_fused(t, annotations=annotations_table(t))
    assert res.violations.count() == 0
    v = res.verdicts.to_pandas()
    assert (v.verdict == "pass").all() and len(v) == 150
