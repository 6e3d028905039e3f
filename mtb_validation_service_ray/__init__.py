"""mtb_validation_service_ray — a Ray-Data-native schema + constraint
validation engine for image+caption tables, built from scratch with the
query/data-processing capabilities of dnpm-dip/mtb-validation-service
(reference read-only at /root/reference; see SURVEY.md).

The reference validates one deeply nested clinical record per request
(Scala, cats ValidatedNel issue accumulation —
reference impl/src/main/scala/.../MTBValidators.scala:650-743).  This
engine re-expresses the same rule *semantics* — presence, value-set /
code-system membership, regex plausibility, closed-interval ranges,
cross-field consistency, referential links, cardinality, severity-graded
issues with hierarchical paths — as streaming ``map_batches`` passes over
zero-copy Arrow batches of a columnar image+caption table
(``image_id, bytes, w, h, fmt, caption, phash``), plus dataset-level
checks promoted to shuffles (uniqueness, semi/anti joins) and
per-partition statistics/drift sketches accumulated in actor-pool state.

Layout:
  schema.py      pinned Arrow schemas (input / violations / verdicts)
  rules/         Rule model, vectorized kernels, default registry
  functions/     codecs (raw/png/lossy), sketches (HLL/t-digest), text fns
  sources/       IO shim (lance-or-parquet) + deterministic fixture generator
  stages/        map_batches / groupby stages (row pass, decode, unique,
                 referential, stats, dedup, similarity, multimodal)
  state/         broadcast helpers + value-set catalogs
  pipelines/     end-to-end validate job, verdict roll-up, checkpointing
"""

__version__ = "0.1.0"

SEVERITIES = ("info", "warning", "error", "fatal")
SEVERITY_RANK = {s: i for i, s in enumerate(SEVERITIES)}
