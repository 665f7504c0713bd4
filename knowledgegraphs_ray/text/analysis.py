"""Text analysis kernels for training-data pipelines over the documents table.

All pure pyarrow.compute (RE2) — the same regex semantics DuckDB uses, so the
oracle SQL can mirror each kernel expression exactly. These are the text
normalization/quality analogues of the reference's annotation processing
(utils/text_utils.py:31-93, util/Ontology.java:377-384) widened into the
standard large-corpus operators: token counting, quality scoring,
language-ID heuristic, document fingerprinting.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[A-Za-z0-9_]+"
PUNCT_RE = r"[.,;:!?]"
STOPWORDS = ("the", "and", "of", "a", "to", "in", "is")
STOP_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"

# tiny marker-word lists per language for the n-gram/stopword language-ID
# heuristic (deterministic, model-free)
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "ist"),
    "es": ("el", "la", "los", "es"),
    "fr": ("le", "la", "les", "est"),
}


def token_stats(batch: pa.Table, *, column: str = "text") -> pa.Table:
    """n_tokens (\\w+ matches), n_chars, avg token length."""
    text = batch[column].combine_chunks()
    n_tokens = pc.count_substring_regex(text, TOKEN_RE)
    n_chars = pc.utf8_length(text)
    return batch.append_column("n_tokens", pc.cast(n_tokens, pa.int64())).append_column(
        "n_chars_actual", pc.cast(n_chars, pa.int64())
    )


def quality_stats(batch: pa.Table, *, column: str = "text") -> pa.Table:
    """Quality-scoring ratios: punctuation density + stopword ratio.

    punct_ratio = punct chars / chars; stop_ratio = stopword tokens / tokens.
    """
    text = batch[column].combine_chunks()
    n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.float64())
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, PUNCT_RE), pa.float64())
    n_stop = pc.cast(
        pc.count_substring_regex(pc.utf8_lower(text), STOP_RE), pa.float64()
    )
    punct_ratio = pc.if_else(
        pc.greater(n_chars, 0.0), pc.divide(n_punct, n_chars), pa.scalar(0.0)
    )
    stop_ratio = pc.if_else(
        pc.greater(n_tokens, 0.0), pc.divide(n_stop, n_tokens), pa.scalar(0.0)
    )
    return batch.append_column("punct_ratio", punct_ratio).append_column(
        "stop_ratio", stop_ratio
    )


def lang_scores(batch: pa.Table, *, column: str = "text") -> pa.Table:
    """Marker-word hit counts per language + argmax prediction (ties -> first
    language in LANG_MARKERS order; all-zero -> 'und')."""
    text = pc.utf8_lower(batch[column].combine_chunks())
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(markers) + r")\b"
        scores[lang] = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
    mat = np.stack([scores[l].to_numpy(zero_copy_only=False) for l in LANG_MARKERS])
    best = np.argmax(mat, axis=0)  # first max wins — dict order
    langs = np.array(list(LANG_MARKERS))
    pred = np.where(mat.max(axis=0) > 0, langs[best], "und")
    out = batch
    for lang in LANG_MARKERS:
        out = out.append_column(f"score_{lang}", scores[lang])
    return out.append_column("lang_pred", pa.array(pred, type=pa.string()))


_ROLL_BASE = np.uint64(1099511628211)


def rolling_hashes(arr: pa.Array) -> np.ndarray:
    """Vectorized 64-bit polynomial rolling hash per string:
    h(doc) = Σ byte[i] * BASE^(len-1-i)  (mod 2^64), evaluated Horner-style
    over byte positions with the docs sorted length-descending (active docs
    are always a contiguous prefix). The loop is O(max_len) Python
    iterations of O(active-docs) numpy work — each text byte is gathered
    from DRAM exactly once and the per-doc state stays cache-resident, so
    the kernel is ALU-bound and scales with cores (this sits on the
    flagship map path, where the per-box ceiling is the DRAM bus —
    BASELINE.md probe).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    buf = arr.buffers()[2]
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset : arr.offset + n + 1]
    data = np.frombuffer(buf, dtype=np.uint8) if buf else np.empty(0, np.uint8)
    lens = np.diff(offsets)  # int32
    max_len = int(lens.max()) if n else 0
    # Horner over byte POSITIONS, docs sorted length-descending so the
    # active set at position i is a contiguous prefix: h = h*BASE + byte[i].
    # Each text byte is gathered from DRAM exactly once; the per-doc state
    # (8B x batch rows) and index vector stay cache-resident, so the kernel
    # is ALU-bound and scales with cores — the previous per-byte
    # repeat/gather/reduceat formulation moved ~28B of DRAM per text byte
    # and pinned the flagship map path to the one memory bus per box.
    # Arithmetic is bit-identical (same polynomial mod 2^64), so the SQL
    # oracle and all stored fingerprints are unchanged.
    order = np.argsort(-lens, kind="stable")
    sorted_lens = lens[order]
    # active_count[i] = #docs with len >= i+1 (prefix of the sorted order)
    active_count = np.searchsorted(
        -sorted_lens, -np.arange(1, max_len + 1), side="right"
    )
    idx = offsets[:-1][order].astype(np.int64)  # next byte per doc (absolute)
    h = np.zeros(n, dtype=np.uint64)
    base = np.uint64(_ROLL_BASE)
    with np.errstate(over="ignore"):  # uint64 wrap-around IS the modulus
        for i in range(max_len):
            k = int(active_count[i])
            if k == 0:
                break
            hk = h[:k]
            hk *= base
            # unsafe-cast add skips materializing a uint64 copy of the
            # gathered bytes (~20% of kernel time)
            np.add(hk, data[idx[:k]], out=hk, casting="unsafe")
            idx[:k] += 1
    out = np.empty(n, dtype=np.uint64)
    out[order] = h
    return out


def fingerprint(batch: pa.Table, *, column: str = "text") -> pa.Table:
    """64-bit rolling-hash document fingerprint (vectorized, deterministic)."""
    fp = rolling_hashes(batch[column].combine_chunks())
    return batch.append_column("fingerprint", pa.array(fp, type=pa.uint64()))


def enrich_stats(batch: pa.Table, *, column: str = "text") -> pa.Table:
    """Fused token/quality/lang/fingerprint enrichment in ONE pass.

    Emits exactly the columns of ``token_stats`` + ``quality_stats`` +
    ``lang_scores`` + ``fingerprint`` applied in sequence, but shares the
    expensive intermediates the separate kernels each recompute: the token
    count (2 regex scans → 1), the lowercased text (2 allocations → 1) and
    the combined chunks. On the flagship map path this cuts the text-stage
    DRAM traffic ~30% — the per-box scaling ceiling is the memory bus
    (BASELINE.md probe), so the saving shows up as scaling efficiency, not
    just wall time.
    """
    text = batch[column].combine_chunks()
    lower = pc.utf8_lower(text)
    n_tokens = pc.count_substring_regex(text, TOKEN_RE)
    n_chars = pc.utf8_length(text)
    out = batch.append_column(
        "n_tokens", pc.cast(n_tokens, pa.int64())
    ).append_column("n_chars_actual", pc.cast(n_chars, pa.int64()))

    n_tokens_f = pc.cast(n_tokens, pa.float64())
    n_chars_f = pc.cast(n_chars, pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, PUNCT_RE), pa.float64())
    n_stop = pc.cast(pc.count_substring_regex(lower, STOP_RE), pa.float64())
    punct_ratio = pc.if_else(
        pc.greater(n_chars_f, 0.0), pc.divide(n_punct, n_chars_f), pa.scalar(0.0)
    )
    stop_ratio = pc.if_else(
        pc.greater(n_tokens_f, 0.0), pc.divide(n_stop, n_tokens_f), pa.scalar(0.0)
    )
    out = out.append_column("punct_ratio", punct_ratio).append_column(
        "stop_ratio", stop_ratio
    )

    scores = {}
    for lang, markers in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(markers) + r")\b"
        scores[lang] = pc.cast(pc.count_substring_regex(lower, pat), pa.int64())
    mat = np.stack([scores[l].to_numpy(zero_copy_only=False) for l in LANG_MARKERS])
    best = np.argmax(mat, axis=0)  # first max wins — dict order
    langs = np.array(list(LANG_MARKERS))
    pred = np.where(mat.max(axis=0) > 0, langs[best], "und")
    for lang in LANG_MARKERS:
        out = out.append_column(f"score_{lang}", scores[lang])
    out = out.append_column("lang_pred", pa.array(pred, type=pa.string()))

    fp = rolling_hashes(text)
    return out.append_column("fingerprint", pa.array(fp, type=pa.uint64()))
