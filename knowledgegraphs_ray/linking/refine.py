"""Mapping extension + filtering (H7 analogue).

Reference: align/bertmap/mapping_refinement.py:100-262 — iterative one-hop
extension: for each accepted (src, tgt) pair, score the frontier
(parents x parents ∪ children x children); keep pairs scoring >= kappa;
iterate (<= 10 rounds); final filter at lambda.

The pair sets are ontology-sized (small), so the loop runs on the driver;
each round's scoring is one vectorized pass through the same surrogate
scorer the linking stage uses (swap-in point for the BERT classifier). A
per-pair memo (D4, mapping_refinement.py:83-87) avoids rescoring.
"""

from __future__ import annotations

from knowledgegraphs_ray.linking.mentions import normalize_label
from knowledgegraphs_ray.linking.scorer import char_ngrams, jaccard
from knowledgegraphs_ray.rules.hierarchy import Hierarchy

KAPPA = 0.85  # extension threshold (bertmap_main.py:141)
LAMBDA = 0.90  # final filter threshold (bertmap_main.py:142)
MAX_ITER = 10


def _surrogate(a: str, b: str) -> float:
    na, nb = normalize_label(a), normalize_label(b)
    return 0.5 * jaccard(char_ngrams(na), char_ngrams(nb)) + 0.5 * jaccard(
        set(na.split()), set(nb.split())
    )


def _children(h: Hierarchy) -> dict[str, list[str]]:
    kids: dict[str, list[str]] = {}
    for c, ps in h.parents.items():
        for p in ps:
            kids.setdefault(p, []).append(c)
    return kids


def extend_mappings(
    seeds: dict[str, str],
    src_h: Hierarchy,
    tgt_h: Hierarchy,
    *,
    labels: dict[str, str] | None = None,
    kappa: float = KAPPA,
    max_iter: int = MAX_ITER,
    score_fn=None,
) -> dict[str, float]:
    """seeds: src_iri -> tgt_iri. Returns {(src, tgt) key 'src|tgt': score}
    for seeds (score 1.0) plus extension pairs scoring >= kappa."""
    score_fn = score_fn or _surrogate
    lab = labels or {}

    def name(iri: str) -> str:
        return lab.get(iri, iri.split(":", 1)[-1])

    accepted: dict[tuple[str, str], float] = {(s, t): 1.0 for s, t in seeds.items()}
    memo: dict[tuple[str, str], float] = {}
    src_kids, tgt_kids = _children(src_h), _children(tgt_h)
    frontier = list(accepted)
    for _ in range(max_iter):
        candidates: set[tuple[str, str]] = set()
        for s, t in frontier:
            for sp in src_h.parents.get(s, ()):
                for tp in tgt_h.parents.get(t, ()):
                    candidates.add((sp, tp))
            for sc in src_kids.get(s, ()):
                for tc in tgt_kids.get(t, ()):
                    candidates.add((sc, tc))
        candidates -= set(accepted)
        if not candidates:
            break
        new: list[tuple[str, str]] = []
        for pair in sorted(candidates):
            sc = memo.get(pair)
            if sc is None:
                sc = score_fn(name(pair[0]), name(pair[1]))
                memo[pair] = sc
            if sc >= kappa:
                accepted[pair] = sc
                new.append(pair)
        if not new:
            break
        frontier = new
    return {f"{s}|{t}": v for (s, t), v in accepted.items()}


def filter_mappings(mappings: dict[str, float], *, lam: float = LAMBDA) -> dict[str, float]:
    """Final threshold filter (mapping_refinement.py:203-262)."""
    return {k: v for k, v in mappings.items() if v >= lam}
