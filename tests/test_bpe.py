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


def test_encode_ids_consistent_with_counts(sf_dir):
    """token_ids lengths == the oracle-adjacent n_bpe_tokens; every id is in
    the vocab range; vocab is deterministic."""
    import ray.data

    from knowledgegraphs_ray.text.bpe import (
        bpe_token_counts,
        build_vocab,
        encode_token_ids,
        train_bpe,
        word_counts,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    counts = word_counts(docs)
    tok = train_bpe(counts, num_merges=50)
    vocab = build_vocab(tok, counts)
    assert build_vocab(tok, counts) == vocab  # pure function

    enc = encode_token_ids(docs, tok, vocab).to_pandas().sort_values("doc_id")
    cnt = bpe_token_counts(docs, tok).to_pandas().sort_values("doc_id")
    assert (enc["token_ids"].map(len).to_numpy() == cnt["n_bpe_tokens"].to_numpy()).all()
    mx = max((max(x) for x in enc["token_ids"] if len(x)), default=0)
    assert 0 <= mx < len(vocab)


def test_chunk_token_ids_matches_count_chunker(sf_dir):
    """chunk_token_ids (ids travel) and chunk_sequences (counts only,
    oracle-checked) agree on the chunk structure, and each chunk's ids are
    the right slice of the document sequence."""
    import numpy as np
    import ray.data

    from knowledgegraphs_ray.pipelines.training_data import chunk_sequences
    from knowledgegraphs_ray.text.bpe import (
        build_vocab,
        chunk_token_ids,
        encode_token_ids,
        train_bpe,
        word_counts,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    counts = word_counts(docs)
    tok = train_bpe(counts, num_merges=50)
    vocab = build_vocab(tok, counts)
    enc = encode_token_ids(docs, tok, vocab)
    chunks = (
        chunk_token_ids(enc, chunk_size=32, stride=24)
        .to_pandas()
        .sort_values(["doc_id", "seq_idx"])
        .reset_index(drop=True)
    )
    # count-twin: feed the id lengths through the oracle-checked chunker
    lens = enc.to_pandas()
    lens["n_tokens"] = lens["token_ids"].map(len)
    twin = (
        chunk_sequences(
            ray.data.from_pandas(lens[["doc_id", "n_tokens"]]),
            chunk_size=32,
            stride=24,
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    twin = twin[twin["chunk_tokens"] > 0].reset_index(drop=True)
    assert len(chunks) == len(twin)
    assert (chunks["doc_id"].to_numpy() == twin["doc_id"].to_numpy()).all()
    assert (chunks["n_tokens"].to_numpy() == twin["chunk_tokens"].to_numpy()).all()
    # slice fidelity on a sample of docs
    full = {r.doc_id: list(r.token_ids) for r in lens.itertuples()}
    for r in chunks.head(200).itertuples():
        lo = r.seq_idx * 24
        assert list(r.token_ids) == full[r.doc_id][lo : lo + 32]


def test_chunk_token_ids_sliced_block_regression():
    """A SLICED ListArray block (possible under zero_copy_batch) must chunk
    identically to the unsliced one: flatten() rebases values while .offsets
    stays absolute, so the kernel has to rebase offsets (ADVICE r3). Feeds
    the kernel directly — Ray ingestion can normalize slices away."""
    import pyarrow as pa

    from knowledgegraphs_ray.text.bpe import _chunk_ids_kernel

    ids = [list(range(i * 10, i * 10 + n)) for i, n in enumerate([5, 40, 0, 70, 33])]
    full = pa.table(
        {
            "doc_id": pa.array(list(range(5)), pa.int64()),
            "token_ids": pa.array(ids, pa.list_(pa.int32())),
        }
    )
    sliced = full.slice(2)  # drops two leading lists
    # document the hazard on the RAW sliced array: absolute offsets vs
    # rebased flatten() — the kernel's `offsets - offsets[0]` guards the
    # case where combine_chunks returns such a view unnormalized
    raw = sliced["token_ids"].chunk(0)
    assert raw.offsets[0].as_py() > 0
    assert len(raw.flatten()) == raw.offsets[-1].as_py() - raw.offsets[0].as_py()

    got = _chunk_ids_kernel(sliced, "doc_id", 16, 8).to_pandas()
    # chunk ids must be actual slices of the source lists
    src = {i: ids[i] for i in range(2, 5)}
    assert len(got) > 0
    for r in got.itertuples():
        lo = r.seq_idx * 8
        assert list(r.token_ids) == src[r.doc_id][lo : lo + 16]
