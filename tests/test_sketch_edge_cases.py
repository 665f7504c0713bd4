"""Edge cases for the sketch kernels: empty docs, unicode, segment safety
(regression tests for the reduceat empty-segment corruption found by
hypothesis in the rolling hash)."""

import numpy as np
import pyarrow as pa

from knowledgegraphs_ray.dedup.minhash import MinHashKernel
from knowledgegraphs_ray.dedup.simhash import simhash_batch


def _batch(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_minhash_signatures_unaffected_by_empty_neighbors():
    kern = MinHashKernel()
    texts = ["alpha beta gamma delta", "", "alpha beta gamma delta", ""]
    _, sigs = kern.signatures(_batch(texts))
    assert (sigs[0] == sigs[2]).all()  # identical docs, empty docs between
    # empty docs keep the sentinel signature
    assert (sigs[1] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()

    # batching must not change signatures
    _, alone = kern.signatures(_batch(["alpha beta gamma delta"]))
    assert (sigs[0] == alone[0]).all()


def test_simhash_unaffected_by_empty_neighbors():
    fp = simhash_batch(_batch(["x y z", "", "x y z"]))["simhash"].to_numpy()
    assert fp[0] == fp[2]
    assert fp[1] == 0  # empty doc

    alone = simhash_batch(_batch(["x y z"]))["simhash"].to_numpy()
    assert fp[0] == alone[0]


def test_unicode_and_leading_empty():
    kern = MinHashKernel()
    texts = ["", "été café naïve encore", ""]
    _, sigs = kern.signatures(_batch(texts))
    _, alone = kern.signatures(_batch([texts[1]]))
    assert (sigs[1] == alone[0]).all()
