"""Value-set catalogs — the engine analog of the reference's external
code systems (ICD-10-GM / ICD-O-3 / ATC / HGNC), which are loaded once
per JVM as versioned providers (MTBValidators.scala:126-132,747-770) and
consulted via ``code ∈ catalog`` checks (csCodingValidator,
MTBValidators.scala:144,155).

Catalogs are versioned: lookups pin a version when the data carries one
and fall back to the current version otherwise
(icdo3TCodingValidator, MTBValidators.scala:136-145).
"""

from __future__ import annotations

FMT_CATALOG: dict[str, frozenset[str]] = {
    # engine-version value sets for the `fmt` coded column
    "1.0": frozenset({"raw", "png"}),
    "1.1": frozenset({"raw", "png", "lossy"}),
}
FMT_CURRENT_VERSION = "1.1"

# caption language/charset plausibility value set (second catalog —
# analog of the morphology catalog, MTBValidators.scala:147-156)
CAPTION_LANG_CATALOG: dict[str, frozenset[str]] = {
    "1.0": frozenset({"en", "de", "fr", "es", "zh"}),
}
CAPTION_LANG_CURRENT_VERSION = "1.0"


def catalog_values(catalog: dict[str, frozenset[str]], version: str | None, current: str) -> frozenset[str]:
    """Version-pinned lookup with fall-back to the current version."""
    if version is not None and version in catalog:
        return catalog[version]
    return catalog[current]


def fmt_values(version: str | None = None) -> frozenset[str]:
    return catalog_values(FMT_CATALOG, version, FMT_CURRENT_VERSION)


# caption vocabulary (third catalog — the HGNC-gene-set analog used by
# the validateEach list rule R-VSL-CAPWORDS; the fixture generator
# composes captions from exactly these words)
CAPTION_KEYS = (
    "red green blue golden silver small large bright dark fuzzy striped spotted "
    "young old happy quiet loud swift lazy curious"
).split()
CAPTION_NOUNS = (
    "cat dog bird fish horse tiger fox owl bear deer whale crane lizard rabbit"
).split()
CAPTION_VERBS = "sits runs sleeps jumps waits watches plays hides swims stands".split()
CAPTION_PLACES = (
    "meadow forest river harbor rooftop garden desert canyon market library"
).split()

CAPTION_VOCAB_CATALOG: dict[str, frozenset[str]] = {
    "1.0": frozenset(
        CAPTION_KEYS + CAPTION_NOUNS + CAPTION_VERBS + CAPTION_PLACES + ["in", "the"]
    ),
}
CAPTION_VOCAB_CURRENT_VERSION = "1.0"


def caption_vocab(version: str | None = None) -> frozenset[str]:
    return catalog_values(
        CAPTION_VOCAB_CATALOG, version, CAPTION_VOCAB_CURRENT_VERSION
    )
