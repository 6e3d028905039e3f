"""Deterministic image-table fixture generator + corruption matrix.

Mirrors the reference's test strategy — *generate a valid record, apply
deterministic invalidators, assert the violations*
(Tests.scala:26-56, Invalidators.scala:25-109) — upgraded to golden
row-for-row equality on the violations table (FIXTURES.md §3/§4).

Everything is seed-pinned and platform-stable (splitmix64 + Philox); the
same code generates 1k-row unit fixtures driver-side and multi-million
row bench tables through a Ray ``range → map_batches`` pipeline
(no external data, no network).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..functions import codec
from ..schema import IMAGE_SCHEMA_PARTITIONED, PARTITION_COL

# caption vocabulary — the first word is the referential key
# (caption_key = first word lowercased; caption_refs = this key list);
# the full vocabulary lives in the catalog layer so the R-VSL-CAPWORDS
# list rule validates against the same source of truth
from ..state.catalogs import (  # noqa: F401  (re-exported for callers)
    CAPTION_KEYS,
    CAPTION_NOUNS,
    CAPTION_PLACES,
    CAPTION_VERBS,
)

FMT_WEIGHTS = {"png": 0.90, "raw": 0.06, "lossy": 0.04}  # skewed on purpose
HOT_DIM = (64, 64)  # 70% of rows share one dimension mode (skew fixture)
PHASH_HOT_CLUSTER_FRACTION = 0.05  # forced hot phash value (skew fixture)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Bijective 64-bit mixer — unique ids from unique indices."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    x ^= x >> np.uint64(31)
    return x


def make_image_rows(
    start: int, count: int, *, seed: int = 42, total: int | None = None,
    n_partitions: int = 8,
) -> pa.Table:
    """Generate rows [start, start+count) of the valid image table."""
    total = total if total is not None else start + count
    idx = np.arange(start, start + count, dtype=np.uint64)
    return rows_for_indices(idx, seed=seed, total=total, n_partitions=n_partitions)


def rows_for_indices(
    indices, *, seed: int = 42, total: int, n_partitions: int = 8,
    skew: bool = False,
) -> pa.Table:
    """Generate the valid image rows for an arbitrary index array.

    Pure function of (indices, seed, total, n_partitions, skew) — the
    body of a ``ray.data.range(n).map_batches`` generation pipeline at
    bench scale and of the driver-side unit fixtures (same bytes either
    way).

    ``skew=True`` hardens the already-skewed defaults into the SURVEY
    §7.3 #7 threat profile the skew scale drill exercises: 99% one
    ``fmt`` (vs 90%) and a 30% ``phash`` hot cluster (vs 5%) — one key
    carries nearly the whole table through every fmt groupby and the
    hot phash forms a single ~0.3·n-member collision group in any
    hash-keyed dedup."""
    idx = np.asarray(indices, dtype=np.uint64)
    count = len(idx)
    start = int(idx[0]) if count else 0
    mixed = _splitmix64(idx + np.uint64(seed) * np.uint64(0x1000003))
    rng = np.random.Generator(np.random.Philox(key=seed, counter=start))

    image_ids = [f"img-{int(m):016x}" for m in mixed]

    # dims: 70% hot mode, rest mixture of small sizes (skew by design)
    hot = rng.random(count) < 0.70
    w = np.where(hot, HOT_DIM[0], rng.integers(16, 129, count)).astype(np.int32)
    h = np.where(hot, HOT_DIM[1], rng.integers(16, 129, count)).astype(np.int32)

    fmt_weights = (
        {"png": 0.99, "raw": 0.006, "lossy": 0.004} if skew else FMT_WEIGHTS
    )
    fmts = rng.choice(
        np.array(list(fmt_weights)), size=count, p=np.array(list(fmt_weights.values()))
    )

    keys = rng.choice(np.array(CAPTION_KEYS), count)
    nouns = rng.choice(np.array(CAPTION_NOUNS), count)
    verbs = rng.choice(np.array(CAPTION_VERBS), count)
    places = rng.choice(np.array(CAPTION_PLACES), count)
    captions = [f"{k} {n} {v} in the {p}" for k, n, v, p in zip(keys, nouns, verbs, places)]

    # phash hot cluster (FIXTURES.md §1): ~5% of rows share one pixel
    # pattern (per dims) — their phash collides NATURALLY, so the
    # integrity rule still holds while phash-keyed groupbys see a hot
    # key.  Deterministic from the mixed id bits.
    hot_frac = 0.30 if skew else PHASH_HOT_CLUSTER_FRACTION
    hot_cluster = (mixed % np.uint64(100)) < np.uint64(int(hot_frac * 100))
    payloads: list[bytes] = []
    phashes = np.empty(count, dtype=np.int64)
    for i in range(count):
        content_key = "hot-cluster" if hot_cluster[i] else image_ids[i]
        px = codec.pixels_for_id(content_key, int(w[i]), int(h[i]))
        payloads.append(codec.encode(px, str(fmts[i])))
        phashes[i] = codec.phash(px)

    partition_ids = (idx * np.uint64(n_partitions) // np.uint64(max(total, 1))).astype(
        np.int32
    )
    np.clip(partition_ids, 0, n_partitions - 1, out=partition_ids)

    return pa.table(
        {
            "image_id": pa.array(image_ids, pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
            "w": pa.array(w, pa.int32()),
            "h": pa.array(h, pa.int32()),
            "fmt": pa.array([str(f) for f in fmts], pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
            PARTITION_COL: pa.array(partition_ids, pa.int32()),
        },
        schema=IMAGE_SCHEMA_PARTITIONED,
    )


def caption_refs_table() -> pa.Table:
    """Valid referenced key set (semi-join target) — analog of the
    reference's supportingFindings index (MTBValidators.scala:669-678)."""
    return pa.table({"caption_key": pa.array(sorted(CAPTION_KEYS), pa.string())})


def annotations_table(images: pa.Table, *, drop_ids: list[str] | None = None) -> pa.Table:
    """Companion table; images lacking an annotation ⇒ orphan warning
    (anti-join; ~ claim/claimResponse check, MTBValidators.scala:621-623)."""
    drop = set(drop_ids or [])
    ids = [i for i in images.column("image_id").to_pylist() if i is not None and i not in drop]
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "note": pa.array([f"note for {i}" for i in ids], pa.string()),
        }
    )


# --- corruption matrix (Invalidators.scala analog) -------------------------


@dataclass
class Corruption:
    """One applied mutator + its exact expected golden violations."""

    table: pa.Table
    golden: list[dict] = field(default_factory=list)  # record_id/rule_id/severity/path
    touched_rows: set[int] = field(default_factory=set)


def _set_cell(table: pa.Table, row: int, col: str, value) -> pa.Table:
    arr = table.column(col)
    py = arr.to_pylist()
    py[row] = value
    return table.set_column(
        table.column_names.index(col), col, pa.array(py, arr.type)
    )


class Invalidators:
    """Deterministic corruption functions.  Each returns the mutated
    table and appends the expected golden violation rows — the engine's
    analog of the reference's 7 ``invalidate`` overloads
    (Invalidators.scala:25-109)."""

    @staticmethod
    def _rid(table: pa.Table, row: int) -> str:
        return table.column("image_id")[row].as_py()

    @staticmethod
    def _pid(table: pa.Table, row: int) -> int:
        return table.column(PARTITION_COL)[row].as_py()

    @staticmethod
    def _row_pixels(table: pa.Table, row: int) -> np.ndarray:
        """Decode the row's CURRENT payload (hot-cluster rows share
        pixel content, so re-deriving from the id would be wrong)."""
        return codec.decode(
            table.column("bytes")[row].as_py(),
            table.column("fmt")[row].as_py(),
            table.column("w")[row].as_py(),
            table.column("h")[row].as_py(),
        )

    @classmethod
    def null_caption(cls, c: Corruption, row: int) -> None:
        c.table = _set_cell(c.table, row, "caption", None)
        rid = cls._rid(c.table, row)
        c.golden.append(dict(record_id=rid, rule_id="R-PR-CAPTION",
                             severity="warning", path="/record/caption"))
        # a lossy row additionally fails the fmt-conditional dispatch
        # (lossy ⇒ caption AND phash required, R-COND-FMT)
        if c.table.column("fmt")[row].as_py() == "lossy":
            c.golden.append(dict(record_id=rid, rule_id="R-COND-FMT",
                                 severity="error", path="/record/fmt/conditional"))
        c.touched_rows.add(row)

    @classmethod
    def empty_bytes(cls, c: Corruption, row: int) -> None:
        c.table = _set_cell(c.table, row, "bytes", b"")
        c.golden.append(dict(record_id=cls._rid(c.table, row), rule_id="R-PR-BYTES",
                             severity="error", path="/record/payload/bytes"))
        c.touched_rows.add(row)

    @classmethod
    def bad_fmt(cls, c: Corruption, row: int) -> None:
        c.table = _set_cell(c.table, row, "fmt", "webp?")
        c.golden.append(dict(record_id=cls._rid(c.table, row), rule_id="R-VS-FMT",
                             severity="error", path="/record/fmt"))
        c.touched_rows.add(row)

    @classmethod
    def bad_id_regex(cls, c: Corruption, row: int) -> None:
        c.table = _set_cell(c.table, row, "image_id", "IMG_1")
        c.golden.append(dict(record_id="IMG_1", rule_id="R-RE-ID",
                             severity="error", path="/record/image_id/format"))
        c.touched_rows.add(row)

    @classmethod
    def out_of_range_dims(cls, c: Corruption, row: int) -> None:
        c.table = _set_cell(c.table, row, "w", 0)
        c.table = _set_cell(c.table, row, "h", 99999)
        rid = cls._rid(c.table, row)
        c.golden.append(dict(record_id=rid, rule_id="R-RG-W", severity="error", path="/record/dims/w"))
        c.golden.append(dict(record_id=rid, rule_id="R-RG-H", severity="error", path="/record/dims/h"))
        c.touched_rows.add(row)

    @classmethod
    def raw_len_mismatch(cls, c: Corruption, row: int) -> None:
        """fmt := raw with a truncated payload; decode rules stay gated
        (andThen) so only R-XF-LEN fires."""
        rid = cls._rid(c.table, row)
        px = cls._row_pixels(c.table, row)
        c.table = _set_cell(c.table, row, "fmt", "raw")
        c.table = _set_cell(c.table, row, "bytes", codec.encode_raw(px)[:-7])
        c.table = _set_cell(c.table, row, "phash", codec.phash(px))
        c.golden.append(dict(record_id=rid, rule_id="R-XF-LEN",
                             severity="error", path="/record/payload/bytes/length"))
        c.touched_rows.add(row)

    @classmethod
    def wrong_magic(cls, c: Corruption, row: int) -> None:
        """declared png, payload actually raw → sniffed fmt mismatch."""
        rid = cls._rid(c.table, row)
        px = cls._row_pixels(c.table, row)
        c.table = _set_cell(c.table, row, "fmt", "png")
        c.table = _set_cell(c.table, row, "bytes", codec.encode_raw(px))
        c.table = _set_cell(c.table, row, "phash", codec.phash(px))
        c.golden.append(dict(record_id=rid, rule_id="R-XF-MAGIC",
                             severity="error", path="/record/payload/magic"))
        c.touched_rows.add(row)

    @classmethod
    def pixel_corruption(cls, c: Corruption, row: int) -> None:
        """Perturb pixels far past the PSNR-40dB budget, re-encode with
        the row's own codec; stored phash no longer matches."""
        rid = cls._rid(c.table, row)
        h = c.table.column("h")[row].as_py()
        fmt = c.table.column("fmt")[row].as_py()
        px = cls._row_pixels(c.table, row)
        bad = px.copy()
        bad[: h // 2] = 255 - bad[: h // 2]  # invert half the image
        c.table = _set_cell(c.table, row, "bytes", codec.encode(bad, fmt))
        c.golden.append(dict(record_id=rid, rule_id="R-XF-PSNR",
                             severity="error", path="/record/payload/integrity"))
        c.touched_rows.add(row)

    @classmethod
    def dangling_caption_ref(cls, c: Corruption, row: int) -> None:
        c.table = _set_cell(c.table, row, "caption", "zzzunresolved thing in the void")
        c.golden.append(dict(record_id=cls._rid(c.table, row), rule_id="R-REF-CAPKEY",
                             severity="fatal", path="/record/caption/key"))
        c.touched_rows.add(row)

    @classmethod
    def zero_phash(cls, c: Corruption, row: int) -> None:
        c.table = _set_cell(c.table, row, "phash", 0)
        c.golden.append(dict(record_id=cls._rid(c.table, row), rule_id="R-RG-PHASH",
                             severity="warning", path="/record/phash"))
        c.touched_rows.add(row)

    @classmethod
    def implausible_caption(cls, c: Corruption, row: int) -> None:
        c.table = _set_cell(c.table, row, "caption", "bad\x01caption\x02text")
        rid = cls._rid(c.table, row)
        c.golden.append(dict(record_id=rid, rule_id="R-RE-CAPTION",
                             severity="warning", path="/record/caption/charset"))
        # the corrupted caption's first word also fails key resolution
        c.golden.append(dict(record_id=rid, rule_id="R-REF-CAPKEY",
                             severity="fatal", path="/record/caption/key"))
        c.touched_rows.add(row)

    @classmethod
    def short_caption(cls, c: Corruption, row: int) -> None:
        """Advisory info-tier trigger: valid key, implausibly short
        caption (Severity.Info analog, MTBValidators.scala:544-547)."""
        c.table = _set_cell(c.table, row, "caption", "red cat")
        c.golden.append(dict(record_id=cls._rid(c.table, row), rule_id="R-RG-CAPLEN",
                             severity="info", path="/record/caption/length"))
        c.touched_rows.add(row)

    @classmethod
    def cond_missing_phash(cls, c: Corruption, row: int) -> None:
        """Status-conditional golden (MTBValidators.scala:279-320 analog):
        a 'png'-status row missing its required phash trips R-COND-FMT.
        Retargets to the first png row at/after ``row`` so the case is
        deterministic regardless of the fmt draw."""
        fmts = c.table.column("fmt").to_pylist()
        while row < len(fmts) and (fmts[row] != "png" or row in c.touched_rows):
            row += 1
        if row >= len(fmts):  # no eligible row in a tiny fixture: skip
            return
        c.table = _set_cell(c.table, row, "phash", None)
        c.golden.append(dict(record_id=cls._rid(c.table, row), rule_id="R-COND-FMT",
                             severity="error", path="/record/fmt/conditional"))
        c.touched_rows.add(row)

    @classmethod
    def bad_caption_word(cls, c: Corruption, row: int) -> None:
        """validateEach golden: one out-of-vocabulary caption word ⇒ one
        issue at the dynamic list-index path /record/caption/words[2]."""
        c.table = _set_cell(c.table, row, "caption", "red cat dances in the meadow")
        c.golden.append(dict(record_id=cls._rid(c.table, row),
                             rule_id="R-VSL-CAPWORDS",
                             severity="warning", path="/record/caption/words[2]"))
        c.touched_rows.add(row)

    @classmethod
    def tail_missing_both(cls, c: Corruption, row: int) -> None:
        """Sorted-tail positional golden (MTBValidators.scala:710-717
        analog): a NON-head row of its partition with neither caption nor
        phash trips R-TAIL-EITHER (plus the order-independent presence
        rules).  Retargets to the first 'raw' row at/after ``row`` that
        is not its partition's head (raw has no R-COND-FMT case, so the
        conditional rule stays quiet)."""
        fmts = c.table.column("fmt").to_pylist()
        pids = c.table.column(PARTITION_COL).to_pylist()
        ids = c.table.column("image_id").to_pylist()
        heads: dict[int, str] = {}
        for pid, rid_ in zip(pids, ids):
            if pid not in heads or rid_ < heads[pid]:
                heads[pid] = rid_
        while row < len(fmts) and (
            fmts[row] != "raw"
            or ids[row] == heads[pids[row]]
            or row in c.touched_rows
        ):
            row += 1
        if row >= len(fmts):  # no eligible row in a tiny fixture: skip
            return
        c.table = _set_cell(c.table, row, "caption", None)
        c.table = _set_cell(c.table, row, "phash", None)
        rid = cls._rid(c.table, row)
        c.golden.append(dict(record_id=rid, rule_id="R-PR-CAPTION",
                             severity="warning", path="/record/caption"))
        c.golden.append(dict(record_id=rid, rule_id="R-PR-EITHER",
                             severity="warning", path="/record"))
        c.golden.append(dict(record_id=rid, rule_id="R-TAIL-EITHER",
                             severity="error", path="/record/tail"))
        c.touched_rows.add(row)

    @classmethod
    def duplicate_id(cls, c: Corruption, row: int) -> None:
        """Append a copy of the row (same image_id) — exactly-one
        violation, both occurrences flagged (MTBValidators.scala:696-698)."""
        rid = cls._rid(c.table, row)
        dup = c.table.slice(row, 1)
        c.table = pa.concat_tables([c.table, dup])
        c.golden.append(dict(record_id=rid, rule_id="R-UQ-ID",
                             severity="error", path="/record/image_id"))
        c.touched_rows.add(row)
        c.touched_rows.add(c.table.num_rows - 1)


DEFAULT_MUTATIONS: list[tuple[str, int]] = [
    # (mutator name, target row) — rows chosen spread across partitions
    ("null_caption", 3),
    ("empty_bytes", 11),
    ("bad_fmt", 23),
    ("bad_id_regex", 31),
    ("out_of_range_dims", 47),
    ("raw_len_mismatch", 59),
    ("wrong_magic", 67),
    ("pixel_corruption", 73),
    ("dangling_caption_ref", 89),
    ("zero_phash", 97),
    ("implausible_caption", 101),
    ("duplicate_id", 113),
    ("short_caption", 127),
    ("cond_missing_phash", 131),
    ("bad_caption_word", 139),
    ("tail_missing_both", 149),
]


def corrupted_fixture(
    n: int = 1000, *, seed: int = 42, n_partitions: int = 8,
    mutations: list[tuple[str, int]] | None = None,
) -> Corruption:
    """Valid table + the default corruption matrix applied (FIXTURES.md §3)."""
    c = Corruption(table=make_image_rows(0, n, seed=seed, total=n,
                                         n_partitions=n_partitions))
    for name, row in mutations if mutations is not None else DEFAULT_MUTATIONS:
        if row < n:
            getattr(Invalidators, name)(c, row)
    return c


def golden_table(c: Corruption) -> pa.Table:
    """Expected violations as a sorted Arrow table (record_id, rule_id,
    severity, path) — the golden contract for row-for-row equality."""
    rows = sorted(c.golden, key=lambda g: (g["record_id"], g["rule_id"]))
    return pa.table(
        {
            "record_id": pa.array([g["record_id"] for g in rows], pa.string()),
            "rule_id": pa.array([g["rule_id"] for g in rows], pa.string()),
            "severity": pa.array([g["severity"] for g in rows], pa.string()),
            "path": pa.array([g["path"] for g in rows], pa.string()),
        }
    )
