"""Text-semantics corpora builder (B3) — training pairs for a future
fine-tuned scorer.

Reference: align/bertmap/text_semantics.py:162-343,486-584 — synonym pairs =
cartesian products within each class's annotation set; soft negatives =
random cross-class pairs; hard negatives = sibling-class pairs; order-
preserving dedup (D1, uniqify) and nonsyn − syn subtraction.

Deterministic (seeded) and driver-sized (ontology-scale), producing the JSON
corpus a HF trainer would consume at the B2 seam. No torch here — the output
is the artifact, not the training run.
"""

from __future__ import annotations

import json
import random

from knowledgegraphs_ray.linking.index import AnnotationIndex
from knowledgegraphs_ray.rules.hierarchy import Hierarchy


def uniqify(pairs: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Order-preserving exact dedup (DataUtils.uniqify, D1)."""
    seen: set[tuple[str, str]] = set()
    out = []
    for p in pairs:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


def build_corpora(
    index: AnnotationIndex,
    hierarchy: Hierarchy | None = None,
    *,
    soft_negatives_per_entity: int = 2,
    seed: int = 0,
) -> dict:
    """-> {synonyms: [(a,b)...], soft_nonsynonyms: [...], hard_nonsynonyms: [...]}"""
    rng = random.Random(seed)
    entities = sorted(index.labels)

    synonyms: list[tuple[str, str]] = []
    for iri in entities:
        labs = index.labels[iri]
        for a in labs:  # cartesian product within the annotation set
            for b in labs:
                synonyms.append((a, b))
    synonyms = uniqify(synonyms)
    syn_set = set(synonyms)

    soft: list[tuple[str, str]] = []
    for iri in entities:
        labs = index.labels[iri]
        if not labs:
            continue
        for _ in range(soft_negatives_per_entity):
            other = entities[rng.randrange(len(entities))]
            if other == iri or not index.labels[other]:
                continue
            pair = (rng.choice(labs), rng.choice(index.labels[other]))
            if pair not in syn_set:  # nonsyn − syn (text_semantics.py:553-557)
                soft.append(pair)
    soft = uniqify(soft)

    hard: list[tuple[str, str]] = []
    if hierarchy is not None:
        for group in hierarchy.siblings():  # sibling classes = hard negatives
            for i, a in enumerate(group):
                for b in group[i + 1 :]:
                    for la in index.labels.get(a, []):
                        for lb in index.labels.get(b, []):
                            if (la, lb) not in syn_set:
                                hard.append((la, lb))
    hard = uniqify(hard)

    return {
        "synonyms": synonyms,
        "soft_nonsynonyms": soft,
        "hard_nonsynonyms": hard,
    }


def save_corpora(corpora: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(corpora, f)
