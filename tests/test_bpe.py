"""BPE training/encoding (text/bpe.py) vs an independent brute-force
reference: classic O(n^2) retrain-every-merge BPE over the same word
counts must produce the identical merge list, and the distributed encode
stage must agree with per-word encoding."""

import re

import polars as pl
import pytest
import ray

from knowledgegraphs_ray.text.analysis import TOKEN_RE
from knowledgegraphs_ray.text.bpe import (
    BPETokenizer,
    bpe_token_counts,
    train_bpe,
    train_bpe_from_corpus,
    word_counts,
)

_EOW = "▁"


def brute_force_bpe(counts: dict[str, int], num_merges: int):
    """Textbook BPE: recount every pair from scratch after each merge."""
    words = {w: list(w[:-1]) + [w[-1] + _EOW] for w in counts if w}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + counts[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] <= 0:
            break
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


CORPUS = [
    {"doc_id": 0, "text": "low lower lowest low low"},
    {"doc_id": 1, "text": "new newer newest new new new"},
    {"doc_id": 2, "text": "wider wide widest wider"},
    {"doc_id": 3, "text": ""},
    {"doc_id": 4, "text": "low new wide low new"},
]


def _counts_dict():
    c = {}
    for row in CORPUS:
        for w in re.findall(TOKEN_RE, row["text"].lower()):
            c[w] = c.get(w, 0) + 1
    return c


def test_incremental_trainer_matches_brute_force():
    cd = _counts_dict()
    counts = pl.DataFrame(
        {"word": list(cd.keys()), "n": list(cd.values())}
    ).sort(["n", "word"], descending=[True, False])
    for nm in (1, 5, 20, 200):
        mine = train_bpe(counts, num_merges=nm).merges
        gold = brute_force_bpe(cd, nm)
        assert mine == gold, f"divergence at num_merges={nm}"


def test_corpus_training_and_distributed_encode():
    docs = ray.data.from_items(CORPUS)
    tok = train_bpe_from_corpus(docs, num_merges=30)
    # merges equal the brute-force list over the same corpus
    assert tok.merges == brute_force_bpe(_counts_dict(), 30)
    out = (
        bpe_token_counts(docs, tok)
        .to_pandas()
        .set_index("doc_id")["n_bpe_tokens"]
        .sort_index()
    )
    # distributed counts equal driver-side encode lengths
    for row in CORPUS:
        assert out[row["doc_id"]] == len(tok.encode(row["text"]))
    assert out[3] == 0
    # after enough merges frequent words collapse to single tokens
    assert tok.encode("low") == ["low" + _EOW]


def test_word_counts_truncation_and_determinism():
    docs = ray.data.from_items(CORPUS)
    full = word_counts(docs)
    top3 = word_counts(docs, max_words=3)
    assert top3.height == 3
    # truncation keeps the most frequent words (ties by word asc, the
    # same ordering both calls use)
    assert top3["word"].to_list() == full["word"].to_list()[:3]
    t1 = train_bpe_from_corpus(docs, num_merges=10)
    t2 = train_bpe_from_corpus(docs, num_merges=10)
    assert t1.merges == t2.merges


def test_encode_unknown_chars_fall_back_to_symbols():
    tok = BPETokenizer(merges=[("l", "o"), ("lo", "w" + _EOW)])
    assert tok.encode("low") == ["low" + _EOW]
    assert tok.encode("xyz") == ["x", "y", "z" + _EOW]
