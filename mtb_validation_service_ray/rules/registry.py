"""Default rule set for the image+caption table.

Each rule re-expresses a reference validator family (SURVEY.md §2.1
mapping column); ids follow FIXTURES.md §3's corruption matrix so the
golden expectations line up one-to-one.

Severity conventions mirror the reference:
  * missing optional value        → warning  (MissingValue default)
  * missing required result/data  → error    (MissingResult default)
  * invalid code / regex / range  → error
  * unresolvable reference        → fatal    (MTBValidators.scala:563-568)
  * advisory checks               → info/warning

Paths are hierarchical, composed with the `at` combinator
(MTBValidators.scala:68-123, 224-227 — `Tumor-Staging/TNM/T-Code`-style
multi-segment paths): rules below declare paths relative to the record
and the whole set is re-rooted under ``/record``; list-column rules add
dynamic ``words[i]`` index segments (core.LIST_KERNELS).
"""

from __future__ import annotations

from ..state.catalogs import (  # noqa: F401
    CAPTION_LANG_CATALOG,
    caption_vocab,
    fmt_values,
)
from .core import Rule, RuleSet

IMAGE_ID_PATTERN = r"img-[0-9a-f]{16}"
CAPTION_PLAUSIBLE_PATTERN = "[\\x20-\\x7E\u00a1-\uffff]+"  # printable ASCII + non-control unicode

MAX_DIM = 16384
PHASH_HAMMING_TOLERANCE_LOSSY = 8  # bits; exact codecs require 0


def default_image_ruleset(
    *, fmt_version: str | None = None, with_referential: bool = True
) -> RuleSet:
    rs = RuleSet(name="image-default")

    # presence battery (diagnosisValidator et al., MTBValidators.scala:230-258)
    rs.add(Rule("R-PR-ID", "presence", "error", "/image_id",
                {"col": "image_id"},
                message="image_id is missing",
                description="required identifier present (must be (defined), MTBValidators.scala:242-244)"))
    rs.add(Rule("R-PR-BYTES", "presence", "error", "/payload/bytes",
                {"col": "bytes"},
                message="image payload is missing or empty",
                description="required payload (MissingResult default error, MTBValidators.scala:402,529)"))
    rs.add(Rule("R-PR-CAPTION", "presence", "warning", "/caption",
                {"col": "caption"},
                message="caption is missing",
                description="optional value missing (MissingValue default warning, MTBValidators.scala:586 inverse)"))
    rs.add(Rule("R-PR-EITHER", "either_or", "warning", "/",
                {"cols": ["caption", "phash"]},
                message="neither caption nor phash present",
                description="either-or presence (tumorStagingValidator TNM ∨ other, MTBValidators.scala:211-217)"))

    # value-set / code-system membership (icdo3TCodingValidator, :136-145)
    rs.add(Rule("R-VS-FMT", "value_set", "error", "/fmt",
                {"col": "fmt", "values": fmt_values(fmt_version)},
                message="fmt not in the engine format catalog",
                description="code ∈ versioned catalog (csCodingValidator, MTBValidators.scala:144,155)"))

    # regex plausibility (TNM regexes, TNM.scala:12-18)
    rs.add(Rule("R-RE-ID", "regex", "error", "/image_id/format",
                {"col": "image_id", "pattern": IMAGE_ID_PATTERN},
                requires=("R-PR-ID",),
                message="image_id does not match ^img-[0-9a-f]{16}$",
                description="anchored id grammar (tumorStagingValidator regexes, MTBValidators.scala:218-222)"))
    rs.add(Rule("R-RE-CAPTION", "regex", "warning", "/caption/charset",
                {"col": "caption", "pattern": CAPTION_PLAUSIBLE_PATTERN},
                requires=("R-PR-CAPTION",),
                message="caption contains implausible characters",
                description="plausibility regex (HGVS protein-change format, MTBValidators.scala:450-460)"))

    # closed-interval ranges (TumorCellContentValidator [0,1], :356-374)
    rs.add(Rule("R-RG-W", "range", "error", "/dims/w",
                {"col": "w", "lo": 1, "hi": MAX_DIM},
                message=f"w outside [1, {MAX_DIM}]",
                description="ClosedInterval containment (MTBValidators.scala:363)"))
    rs.add(Rule("R-RG-H", "range", "error", "/dims/h",
                {"col": "h", "lo": 1, "hi": MAX_DIM},
                message=f"h outside [1, {MAX_DIM}]",
                description="ClosedInterval containment (MTBValidators.scala:363)"))
    rs.add(Rule("R-RG-PHASH", "equality", "warning", "/phash",
                {"col": "phash", "forbidden": 0},
                message="phash is the 0 sentinel value",
                description="quantity within reference range (msi/tmb validators, MTBValidators.scala:410-432)"))

    # advisory info-tier check (the reference's Severity.Info downgrades,
    # e.g. missing fusion lists, MTBValidators.scala:544-547): very short
    # captions are flagged informationally, never affecting acceptance
    rs.add(Rule("R-RG-CAPLEN", "caption_len", "info", "/caption/length",
                {"col": "caption", "min_len": 8},
                requires=("R-PR-CAPTION",),
                message="caption shorter than 8 characters",
                description="advisory length check (Severity.Info tier, MTBValidators.scala:544-547)"))

    # status-conditional dispatch (MTBTherapyValidator: each therapy
    # status implies its own requirement set, MTBValidators.scala:279-320)
    # — the fmt column plays the status role: every lossless 'png' row
    # must carry its integrity phash; a 'lossy' row must carry both the
    # phash AND a caption (quality provenance).
    rs.add(Rule("R-COND-FMT", "conditional_dispatch", "error", "/fmt/conditional",
                {"when_col": "fmt",
                 "cases": {"png": ["phash"], "lossy": ["caption", "phash"]}},
                requires=("R-VS-FMT",),
                message="fmt-conditional required fields missing",
                description="status-conditional dispatch (MTBTherapyValidator, MTBValidators.scala:279-320)"))

    # cross-field derived (PFS/OS weeks ≥ 0, MTBValidators.scala:245-247,312-317)
    rs.add(Rule("R-XF-LEN", "raw_len", "error", "/payload/bytes/length",
                {},
                requires=("R-PR-BYTES", "R-VS-FMT", "R-RG-W", "R-RG-H"),
                message="raw payload length != w*h*3",
                description="derived-quantity consistency, gated andThen (MTBValidators.scala:243,252-254)"))

    # decode-pass rules (stages/decode_pass.py executes these kinds)
    rs.add(Rule("R-XF-MAGIC", "magic_fmt", "error", "/payload/magic",
                {},
                requires=("R-PR-BYTES", "R-VS-FMT", "R-XF-LEN", "R-RG-W", "R-RG-H"),
                message="declared fmt != format sniffed from magic bytes",
                description="method == expected constant (TumorCellContentValidator, MTBValidators.scala:366-371)"))
    rs.add(Rule("R-XF-PSNR", "pixel_integrity", "error", "/payload/integrity",
                {"hamming_tolerance_lossy": PHASH_HAMMING_TOLERANCE_LOSSY},
                requires=("R-PR-BYTES", "R-VS-FMT", "R-XF-MAGIC", "R-XF-LEN",
                          "R-RG-W", "R-RG-H", "R-RG-PHASH"),
                message="decoded pixels fail the phash/PSNR integrity budget",
                description="decoded-pixel invariant (PSNR≥40dB budget, BASELINE.json input_hint)"))

    # referential — caption key resolvable against broadcast key set;
    # dangling ⇒ fatal (MTBRecommendationValidator, MTBValidators.scala:563-568)
    if with_referential:
        rs.add(Rule("R-REF-CAPKEY", "ref_member", "fatal", "/caption/key",
                    {"col": "caption", "refset": "caption_refs",
                     "key_fn": "first_word_lower"},
                    requires=("R-PR-CAPTION",),
                    message="caption key not resolvable in caption_refs",
                    description="Reference(Id) resolution, Fatal on dangling (MTBValidators.scala:563-568)"))

    # validateEach with list-index path segments (each germline code
    # valid, MTBValidators.scala:241): every caption word ∈ vocabulary
    # catalog, one issue per bad word at /record/caption/words[i].
    # Gated (andThen) so an implausible-charset or dangling-key caption
    # is not additionally word-checked.
    vsl_requires = ("R-PR-CAPTION", "R-RE-CAPTION") + (
        ("R-REF-CAPKEY",) if with_referential else ()
    )
    rs.add(Rule("R-VSL-CAPWORDS", "list_value_set", "warning", "/caption",
                {"col": "caption", "values": caption_vocab(), "sep": " ",
                 "elem_label": "words"},
                requires=vsl_requires,
                message="caption word not in the vocabulary catalog",
                description="validateEach + list-index paths (germline codes each-valid, MTBValidators.scala:241)"))

    # hierarchical re-rooting (`validate(record) at "record"`)
    return rs.at("record")


RuleSet.register_plugin("image-default", lambda: default_image_ruleset().rules)
