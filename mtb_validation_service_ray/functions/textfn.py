"""Vectorized text-analysis kernels for the `documents` pipelines:
token counting, quality counts, language-ID heuristic, fingerprinting.

All kernels are Arrow/numpy vectorized (RE2 via pyarrow.compute — the
same regex engine DuckDB uses, so oracle SQL with ``regexp_extract_all``
matches exactly).  No per-row Python in hot paths except where a kernel
is inherently per-string and cheap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_PATTERN = r"[A-Za-z0-9_]+"

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic (public common-word lists; intentionally minimal)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "est", "dans", "que", "pour", "une", "des"),
    "es": ("el", "la", "los", "las", "y", "es", "en", "que", "por", "una"),
}
CJK_PATTERN = "[一-鿿]"


def token_counts(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Number of word tokens per string (BPE-ish regex token proxy)."""
    return pc.count_substring_regex(pc.fill_null(col, ""), TOKEN_PATTERN)


def quality_counts(col) -> dict[str, pa.Array]:
    """Deterministic integer quality ingredients per document: total
    chars, letters, digits, punctuation, whitespace — exact-match
    reproducible in SQL (length + regexp counts)."""
    filled = pc.fill_null(col, "")
    return {
        "n_chars": pc.utf8_length(filled),
        "n_alpha": pc.count_substring_regex(filled, "[A-Za-z]"),
        "n_digit": pc.count_substring_regex(filled, "[0-9]"),
        "n_space": pc.count_substring_regex(filled, r"\s"),
        "n_punct": pc.count_substring_regex(filled, r"[.,;:!?'\"()\[\]-]"),
        "n_tokens": token_counts(col),
    }


def quality_score(col) -> pa.Array:
    """Heuristic [0,1] quality score from the count ingredients
    (length, alpha ratio, whitespace sanity) — the engine's analog of a
    Gopher/C4-style quality filter ingredient."""
    q = quality_counts(col)
    n = pc.cast(q["n_chars"], pa.float64())
    safe_n = pc.max_element_wise(n, 1.0)
    alpha_ratio = pc.divide(pc.cast(q["n_alpha"], pa.float64()), safe_n)
    space_ratio = pc.divide(pc.cast(q["n_space"], pa.float64()), safe_n)
    len_term = pc.min_element_wise(pc.divide(n, 200.0), 1.0)
    # score = 0.5*alpha_ratio + 0.3*len_term + 0.2*(1 - |space_ratio - 0.15|)
    space_term = pc.subtract(
        1.0, pc.abs(pc.subtract(space_ratio, 0.15))
    )
    score = pc.add(
        pc.add(pc.multiply(alpha_ratio, 0.5), pc.multiply(len_term, 0.3)),
        pc.multiply(space_term, 0.2),
    )
    return pc.max_element_wise(pc.min_element_wise(score, 1.0), 0.0)


def token_repetition_ratio(col) -> pa.Array:
    """Per-document token repetition: ``1 − distinct_tokens / tokens``
    over the lowercased whitespace split (0.0 for ≤1-token docs) — the
    Gopher-style repetitiousness ingredient of a quality filter; high
    values mean boilerplate / keyword-stuffing.

    Fully vectorized across the batch: tokens hash via ``polyhash_utf8``
    straight over the Arrow buffers, one ``lexsort((hash, doc))`` and a
    boundary scan count distinct-per-doc for every document at once —
    no per-document Python (collision tolerance ~2^-64, the same as the
    shingle/fingerprint lanes)."""
    tok_list = pc.utf8_split_whitespace(
        pc.utf8_trim_whitespace(pc.utf8_lower(pc.fill_null(col, "")))
    )
    lens = pc.list_value_length(tok_list).to_numpy(zero_copy_only=False)
    n_docs = len(lens)
    flat = pc.list_flatten(tok_list)
    if len(flat) == 0:
        return pa.array(np.zeros(n_docs), pa.float64())
    h = polyhash_utf8(flat)
    d = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    order = np.lexsort((h, d))
    hs, ds = h[order], d[order]
    new_group = np.empty(len(hs), dtype=bool)
    new_group[0] = True
    new_group[1:] = (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])
    distinct = np.bincount(ds[new_group], minlength=n_docs)
    safe = np.maximum(lens, 1)
    out = np.where(lens == 0, 0.0, 1.0 - distinct / safe)
    return pa.array(out, pa.float64())


def detect_language(col) -> pa.Array:
    """Stopword/charset language-ID heuristic over {en,de,fr,es,zh}.

    Vectorized: one RE2 count per language's stopword alternation plus a
    CJK character count; argmax wins, 'und' (undetermined) when no
    signal."""
    filled = pc.utf8_lower(pc.fill_null(col, ""))
    n = len(filled)
    scores = np.zeros((len(STOPWORDS) + 1, n), dtype=np.float64)
    langs = list(STOPWORDS) + ["zh"]
    for i, (lang, words) in enumerate(STOPWORDS.items()):
        pattern = r"\b(" + "|".join(words) + r")\b"
        scores[i] = pc.count_substring_regex(filled, pattern).to_numpy(
            zero_copy_only=False
        )
    # CJK: a single han char is a strong signal; weight ×3
    scores[-1] = 3.0 * pc.count_substring_regex(filled, CJK_PATTERN).to_numpy(
        zero_copy_only=False
    )
    best = np.argmax(scores, axis=0)
    no_signal = scores.max(axis=0) == 0
    out = np.array(langs, dtype=object)[best]
    out[no_signal] = "und"
    return pa.array(out, pa.string())


# byte-level polynomial base (FNV64 prime — odd ⇒ invertible mod 2^64)
_BYTE_P = np.uint64(0x100000001B3)
_BYTE_P_INV = np.uint64(pow(0x100000001B3, -1, 2**64))
_LEN_MIX = np.uint64(0xD6E8FEB86659FD93)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain constant set)."""
    with np.errstate(over="ignore"):
        x = x ^ (x >> np.uint64(30))
        x = x * np.uint64(0xBF58476D1CE4E5B9)
        x = x ^ (x >> np.uint64(27))
        x = x * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


# per-process scratch arena: first-touch page faults on fresh 100MB+
# allocations cost ~1 s/pass in this environment; reusing warmed buffers
# makes the cumprod/cumsum passes pure compute (~14 ns/elem).  Each Ray
# actor/worker process gets its own arena — no sharing, no locking.
_SCRATCH: dict[str, np.ndarray] = {}


def _scratch(name: str, size: int, dtype) -> np.ndarray:
    a = _SCRATCH.get(name)
    if a is None or len(a) < size:
        a = np.empty(int(size * 5 // 4) + 16, dtype)
        _SCRATCH[name] = a
    return a[:size]


def polyhash_utf8(col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Deterministic 64-bit hash per string, computed DIRECTLY over the
    Arrow UTF-8 buffers — zero per-string Python objects (the former
    ``pd.util.hash_array`` path materialized every token as a ``str``
    first, which dominated the MinHash stage — ROADMAP r4 #5).

    h(s) = splitmix64( (Σ_j s[j]·P^j mod 2^64) ⊕ len(s)·C ) with P the
    odd FNV64 prime.  The position weights come from two cumulative
    products over the whole buffer (P^t and P^-t) plus one prefix sum:
    the per-string weighted sum is ``(S[e]-S[s])·P^-s`` — a few
    O(bytes) C passes total, no loop over strings.  Nulls hash as empty
    strings (fill upstream if that matters)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    off_dtype = (
        np.int64 if pa.types.is_large_string(col.type) else np.int32
    )
    offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    buf = col.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8)
        if buf is not None and len(buf)
        else np.empty(0, np.uint8)
    )
    lo, hi = int(offs[0]), int(offs[-1])
    m = hi - lo
    s = offs[:-1] - lo
    e = offs[1:] - lo
    with np.errstate(over="ignore"):
        if m:
            # weights sized m+1 so an empty LAST string (s == e == m)
            # still indexes ipows[s] safely
            pows = _scratch("pows", m + 1, np.uint64)
            pows[0] = 1
            pows[1:].fill(_BYTE_P)
            np.cumprod(pows, out=pows)  # pows[t] = P^t
            ipows = _scratch("ipows", m + 1, np.uint64)
            ipows[0] = 1
            ipows[1:].fill(_BYTE_P_INV)
            np.cumprod(ipows, out=ipows)  # ipows[t] = P^-t
            term = _scratch("term", m, np.uint64)
            np.multiply(data[lo:hi], pows[:m], out=term)
            prefix = _scratch("prefix", m + 1, np.uint64)
            prefix[0] = 0
            np.cumsum(term, out=prefix[1:])
            poly = (prefix[e] - prefix[s]) * ipows[s]
        else:
            poly = np.zeros(n, dtype=np.uint64)
        x = poly ^ ((e - s).astype(np.uint64) * _LEN_MIX)
        return _splitmix64(x)


def fingerprint64(col) -> pa.Array:
    """Document fingerprint: 64-bit hash of the case/whitespace
    normalized text (lowercase, internal runs collapsed, leading and
    trailing whitespace TRIMMED — r4: a trailing blank used to make
    otherwise-identical docs distinct).  Equal fingerprints ⇒
    near-identical documents up to whitespace/case."""
    filled = pc.utf8_lower(pc.fill_null(col, ""))
    normalized = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(filled, r"\s+", " ")
    )
    return pa.array(polyhash_utf8(normalized).astype(np.int64), pa.int64())


# rolling-combination multiplier for word-gram hashes (odd ⇒ invertible
# mod 2^64, so position information is preserved)
_GRAM_P = np.uint64(0x9E3779B97F4A7C15)


def shingle_hashes_batch(
    texts, k: int = 5, *, char_fallback: bool = True
) -> list[np.ndarray]:
    """Hashed k-shingles for a BATCH of documents (word n-grams; char
    shingles for short docs) — MinHash/Jaccard input.

    ``char_fallback=False`` disables the short-doc char-gram fallback:
    a doc with fewer than ``k`` tokens yields an EMPTY hash array —
    the exact "word n-grams only" semantics SQL ``len(tokens) >= k``
    reproduces, which eval-set decontamination needs (a 3-token doc
    shares no 13-gram with anything).

    Batched design (VERDICT r2 #6, vectorized further in r4):
    tokenization is Arrow-native (``utf8_lower`` +
    ``utf8_split_whitespace`` + ``list_flatten``), token hashing is
    ``polyhash_utf8`` straight over the flattened Arrow string buffer —
    NO token ever becomes a Python object (ROADMAP r4 #5; the former
    ``pd.util.hash_array`` path built a ``str`` per token and dominated
    the stage).  Word-gram hashes are a rolling polynomial over
    consecutive token hashes (vectorized sliding window): gram hash =
    Σ_j hash(tok[i+j]) · P^j (mod 2^64) — distinct grams collide only
    at ~2^-64.  Python touches only the rare sub-``k``-token short
    docs (char-gram fallback)."""
    n_docs = len(texts)
    if n_docs == 0:
        return []
    arr = pa.array(
        [t if isinstance(t, str) else "" for t in texts], pa.string()
    )
    # trim first: utf8_split_whitespace collapses internal runs like
    # str.split() but emits empty tokens at leading/trailing whitespace
    tok_list = pc.utf8_split_whitespace(
        pc.utf8_trim_whitespace(pc.utf8_lower(arr))
    )
    lens = pc.list_value_length(tok_list).to_numpy(zero_copy_only=False)
    flat_arr = pc.list_flatten(tok_list)
    n_flat = len(flat_arr)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(lens, dtype=np.int64)

    # short docs (< k tokens): char k-grams of the normalized text —
    # materialize Python strings for THESE docs only
    short_idx = np.flatnonzero(lens < k) if char_fallback else np.empty(0, np.int64)
    short_strs: dict[int, str] = {}
    if len(short_idx):
        joined = pc.binary_join(
            tok_list.take(pa.array(short_idx, pa.int64())), " "
        )
        short_strs = dict(zip(short_idx.tolist(), joined.to_pylist()))

    units: list = []  # char grams of short docs, appended after tokens
    spans: list[tuple[int, int, bool]] = []  # (start, n_units, is_words)
    for d in range(n_docs):
        if lens[d] >= k:
            spans.append((offsets[d], lens[d], True))
        elif not char_fallback:
            spans.append((offsets[d], 0, True))
        else:
            s = short_strs[d]
            grams = [s[i : i + k] for i in range(max(len(s) - k + 1, 1))]
            start = n_flat + len(units)
            units.extend(grams)
            spans.append((start, len(grams), False))
    if n_flat + len(units) == 0:
        return [np.empty(0, dtype=np.uint64) for _ in texts]
    h_tok = polyhash_utf8(flat_arr)
    if units:
        h = np.concatenate([h_tok, polyhash_utf8(pa.array(units, pa.string()))])
    else:
        h = h_tok
    weights = _GRAM_P ** np.arange(k, dtype=np.uint64)
    out: list[np.ndarray] = []
    for start, n, is_words in spans:
        seg = h[start : start + n]
        if not is_words:
            out.append(seg)
            continue
        if n < k:  # char_fallback=False short doc: no word k-grams
            out.append(np.empty(0, dtype=np.uint64))
            continue
        win = np.lib.stride_tricks.sliding_window_view(seg, k)
        with np.errstate(over="ignore"):
            out.append((win * weights[None, :]).sum(axis=1, dtype=np.uint64))
    return out


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Single-document wrapper over ``shingle_hashes_batch`` (one
    source of truth: every consumer — MinHash, SimHash, Jaccard
    verification — sees identical shingle hash values)."""
    return shingle_hashes_batch([text], k)[0]


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / max(len(a | b), 1)
