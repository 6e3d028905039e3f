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
