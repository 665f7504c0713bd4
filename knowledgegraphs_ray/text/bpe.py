"""Byte-pair-encoding tokenizer training + encoding (Sennrich et al.
2016; the GPT-2 recipe) as Ray Data stages.

Scale shape — the one real BPE trainers use (HF tokenizers, SentencePiece
count mode): training never touches documents row-per-token.

* **Word counting** is per-block ``value_counts`` partials ->
  ``fastagg.merge_partials`` (combine-before-shuffle). Only the
  (word, count) table — unique-word-sized, ~1e7 entries for a web crawl,
  Zipf-truncatable via ``max_words`` — leaves the corpus.
* **Merge training** is a driver loop over that word table: classic BPE
  is inherently sequential (merge k+1 depends on merge k), so the right
  distribution boundary is "corpus -> word counts" (distributed) and
  "word counts -> merges" (driver, bounded by vocabulary not corpus).
  Pair counts are recomputed incrementally: only words containing the
  just-merged pair change.
* **Encoding** broadcasts the rank table once (``ray.put``) and maps over
  doc blocks; each block memoizes word -> token-ids (Zipf makes the hit
  rate extreme), so the per-word merge loop runs once per DISTINCT word
  per block, not once per occurrence.

Determinism: ties in pair frequency break lexicographically, so the
merge list is a pure function of the word counts. Tokens are the
reference-free kind of op no SQL engine expresses (iterative merges);
correctness is pinned by a brute-force reference implementation in
tests, not a DuckDB oracle.

Reference analogue: the reference tokenizes with a pretrained BERT
WordPiece vocab (bert_classifier.py); this is the train-your-own tier a
pre-training corpus pipeline needs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import polars as pl
import pyarrow as pa
import ray
import ray.data

from knowledgegraphs_ray.text.analysis import TOKEN_RE
from knowledgegraphs_ray.text.lm import _token_count_partials
from knowledgegraphs_ray.util.fastagg import merge_partials

_EOW = "▁"  # end-of-word sentinel (SentencePiece's metaspace glyph)


def word_counts(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    lower: bool = True,
    driver_limit: int = 5_000_000,
    max_words: int | None = None,
) -> pl.DataFrame:
    """(word, n) over the corpus — the only pass that reads documents."""
    merged = merge_partials(
        _token_count_partials(docs, text_col=text_col, lower=lower),
        keys=["token"],
        agg={"n": "sum"},
        driver_limit=driver_limit,
    )
    if max_words is not None:
        merged = merged.sort(["n", "token"], descending=[True, False]).limit(max_words)
    pdf = pl.from_arrow(pa.Table.from_pandas(merged.to_pandas(), preserve_index=False))
    return pdf.rename({"token": "word"}).sort(["n", "word"], descending=[True, False])


@dataclass
class BPETokenizer:
    """Ordered merge list + derived rank table; broadcastable."""

    merges: list[tuple[str, str]]
    lower: bool = True
    ranks: dict[tuple[str, str], int] = field(default_factory=dict)

    def __post_init__(self):
        if not self.ranks:
            self.ranks = {m: i for i, m in enumerate(self.merges)}

    def encode_word(self, word: str) -> list[str]:
        """Apply merges to one word (symbols end with the EOW sentinel)."""
        syms = list(word[:-1]) + [word[-1] + _EOW] if word else []
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, i)
            if best is None:
                break
            _, i = best
            syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]
        return syms

    def encode(self, text: str) -> list[str]:
        import re

        t = text.lower() if self.lower else text
        out: list[str] = []
        for w in re.findall(TOKEN_RE, t):
            out.extend(self.encode_word(w))
        return out


def train_bpe(
    counts: pl.DataFrame,
    *,
    num_merges: int = 1000,
    lower: bool = True,
) -> BPETokenizer:
    """Driver merge loop over the (word, n) table — bounded by vocabulary
    size, not corpus size (see module docstring). Incremental pair-count
    maintenance: each merge rescans only the words that contain the pair."""
    words: list[list[str]] = [
        list(w[:-1]) + [w[-1] + _EOW] for w in counts["word"] if w
    ]
    freqs: list[int] = [int(n) for w, n in zip(counts["word"], counts["n"]) if w]

    # pair -> total count, and pair -> set of word indexes containing it
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def add_word(wi: int, sign: int) -> None:
        syms, n = words[wi], freqs[wi]
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            pair_counts[p] = pair_counts.get(p, 0) + sign * n
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)

    for wi in range(len(words)):
        add_word(wi, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        live = [(c, p) for p, c in pair_counts.items() if c > 0]
        if not live:
            break
        # max count, ties -> lexicographically smallest pair (determinism)
        best = min(live, key=lambda cp: (-cp[0], cp[1]))[1]
        merges.append(best)
        a, b = best
        joined = a + b
        for wi in sorted(pair_words.get(best, ())):
            syms = words[wi]
            add_word(wi, -1)
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            add_word(wi, +1)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return BPETokenizer(merges=merges, lower=lower)


def train_bpe_from_corpus(
    docs: ray.data.Dataset,
    *,
    num_merges: int = 1000,
    text_col: str = "text",
    lower: bool = True,
    max_words: int | None = None,
) -> BPETokenizer:
    """Convenience: distributed word counting + driver merge training."""
    counts = word_counts(
        docs, text_col=text_col, lower=lower, max_words=max_words
    )
    return train_bpe(counts, num_merges=num_merges, lower=lower)


class _EncodeBlock:
    """Instance-passed broadcast tokenizer; per-block word memo (Zipf:
    the merge loop runs once per distinct word per block)."""

    def __init__(self, ref, *, id_col, text_col):
        self.ref = ref
        self.id_col = id_col
        self.text_col = text_col
        self._tok: BPETokenizer | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import re

        if self._tok is None:
            self._tok = ray.get(self.ref)
        tok = self._tok
        memo: dict[str, int] = {}
        pat = re.compile(TOKEN_RE)
        ids = batch[self.id_col]
        texts = batch[self.text_col].to_pylist()
        n_out = []
        for t in texts:
            t = (t or "")
            t = t.lower() if tok.lower else t
            n = 0
            for w in pat.findall(t):
                c = memo.get(w)
                if c is None:
                    c = len(tok.encode_word(w))
                    memo[w] = c
                n += c
            n_out.append(n)
        return pa.table(
            {self.id_col: ids, "n_bpe_tokens": pa.array(n_out, pa.int64())}
        )


def bpe_token_counts(
    docs: ray.data.Dataset,
    tokenizer: BPETokenizer,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """-> (id_col, n_bpe_tokens) per document; tokenizer ships once."""
    ref = ray.put(tokenizer)
    return docs.map_batches(
        _EncodeBlock(ref, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def build_vocab(tok: BPETokenizer, counts: pl.DataFrame) -> dict[str, int]:
    """Deterministic dense id table: <unk>=0, then the training alphabet
    (sorted base symbols incl. EOW forms), then merge products in merge
    order. A pure function of (counts, merges) — identical at any
    parallelism, so token ids are stable across runs and shards."""
    base: set[str] = set()
    for w in counts["word"]:
        if w:
            base.update(w[:-1])
            base.add(w[-1] + _EOW)
    vocab = {"<unk>": 0}
    for s in sorted(base):
        vocab[s] = len(vocab)
    for a, b in tok.merges:
        m = a + b
        if m not in vocab:
            vocab[m] = len(vocab)
    return vocab


class EncodeIdsBlock:
    """Broadcast (tokenizer, vocab) once; per-block word memo; emits the
    document's dense token-id sequence as list<int32> (OOV symbols -> 0)."""

    def __init__(self, ref, *, id_col: str = "doc_id", text_col: str = "text"):
        self.ref = ref
        self.id_col = id_col
        self.text_col = text_col
        self._tv = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import re

        if self._tv is None:
            self._tv = ray.get(self.ref)
        tok, vocab = self._tv
        memo: dict[str, list[int]] = {}
        pat = re.compile(TOKEN_RE)
        out_ids = []
        for t in batch[self.text_col].to_pylist():
            t = (t or "")
            t = t.lower() if tok.lower else t
            ids: list[int] = []
            for w in pat.findall(t):
                enc = memo.get(w)
                if enc is None:
                    enc = [vocab.get(s, 0) for s in tok.encode_word(w)]
                    memo[w] = enc
                ids.extend(enc)
            out_ids.append(ids)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "token_ids": pa.array(out_ids, pa.list_(pa.int32())),
            }
        )


def encode_token_ids(
    docs: ray.data.Dataset,
    tokenizer: BPETokenizer,
    vocab: dict[str, int],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """-> (id_col, token_ids list<int32>) per document, map-only."""
    ref = ray.put((tokenizer, vocab))
    return docs.map_batches(
        EncodeIdsBlock(ref, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _chunk_ids_kernel(
    batch: pa.Table, id_col: str, chunk_size: int, stride: int
) -> pa.Table:
    """Per-block window expansion; module-level so the sliced-block
    regression test can feed it a genuinely sliced ListArray directly."""
    ids_col = batch["token_ids"].combine_chunks()
    # flatten() rebases values to the slice start on a SLICED ListArray
    # while .offsets stays absolute into the parent values buffer —
    # rebase the offsets to flatten()'s frame so sliced zero-copy
    # blocks index correctly (offsets[0] == 0 on unsliced arrays).
    flat = ids_col.flatten().to_numpy(zero_copy_only=False)
    offsets = ids_col.offsets.to_numpy(zero_copy_only=False)
    offsets = offsets - offsets[0]
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False)
    o_doc, o_seq, o_ids, o_n = [], [], [], []
    for di in range(len(doc_ids)):
        start, end = int(offsets[di]), int(offsets[di + 1])
        n = end - start
        if n == 0:
            continue
        n_chunks = max(1, -(-(max(n - chunk_size, 0)) // stride) + 1)
        for ci in range(n_chunks):
            lo = start + ci * stride
            hi = min(lo + chunk_size, end)
            if lo >= end:
                break
            o_doc.append(doc_ids[di])
            o_seq.append(ci)
            o_ids.append(flat[lo:hi])
            o_n.append(hi - lo)
    return pa.table(
        {
            id_col: pa.array(o_doc, pa.int64()),
            "seq_idx": pa.array(o_seq, pa.int64()),
            "token_ids": pa.array([x.tolist() for x in o_ids], pa.list_(pa.int32())),
            "n_tokens": pa.array(o_n, pa.int64()),
        }
    )


def chunk_token_ids(
    encoded: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    chunk_size: int = 128,
    stride: int = 96,
) -> ray.data.Dataset:
    """Expand each document's id sequence into overlapping fixed-window
    training sequences: (doc_id, seq_idx, token_ids, n_tokens). Same window
    rule as pipelines.training_data.chunk_sequences (oracle-checked there);
    here the actual ids travel. Map-only — a document's chunks are a local
    decision."""
    import functools

    kern = functools.partial(
        _chunk_ids_kernel, id_col=id_col, chunk_size=chunk_size, stride=stride
    )
    return encoded.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True)
