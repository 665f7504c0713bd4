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


# ---------------------------------------------------------------------------
# Full BERTMap corpus structure (text_semantics.py:162-584)


class AnnotationThesaurus:
    """Synonym-group extraction over an AnnotationIndex
    (text_semantics.py:40-160): a synonym group = one class's annotation
    set; ``apply_transitivity`` merges groups sharing a label (connected
    components — BERTMap default is OFF)."""

    def __init__(
        self, index: AnnotationIndex, *, apply_transitivity: bool = False, seed: int = 0
    ):
        self.index = index
        self.rng = random.Random(seed)
        groups = [frozenset(labs) for labs in index.labels.values() if labs]
        if apply_transitivity:
            groups = self._merge_transitive(groups)
        # deterministic order
        self.synonym_groups: list[frozenset] = sorted(
            set(groups), key=lambda g: sorted(g)
        )

    @staticmethod
    def _merge_transitive(groups: list[frozenset]) -> list[frozenset]:
        from knowledgegraphs_ray.canon.unionfind import UnionFind

        uf = UnionFind()
        for g in groups:
            labs = sorted(g)
            for lab in labs[1:]:
                uf.union(labs[0], lab)
        comp: dict = {}
        for g in groups:
            for lab in g:
                comp.setdefault(uf.find(lab), set()).add(lab)
        return [frozenset(s) for s in comp.values()]

    def synonym_sampling(self, num_samples: int | None = None) -> list[tuple[str, str]]:
        """All (a, b) pairs within each synonym group (text_semantics:162-189)."""
        pool: list[tuple[str, str]] = []
        for group in self.synonym_groups:
            labs = sorted(group)
            for a in labs:
                for b in labs:
                    pool.append((a, b))
        pool = uniqify(pool)
        if num_samples is None or num_samples >= len(pool):
            return pool
        return self.rng.sample(pool, num_samples)

    def soft_nonsynonym_sampling(
        self, num_samples: int, max_iter: int = 5
    ) -> list[tuple[str, str]]:
        """Random label pairs from two different synonym groups
        (text_semantics:190-228)."""
        if len(self.synonym_groups) < 2 or num_samples <= 0:
            return []
        pool: list[tuple[str, str]] = []
        for _ in range(num_samples):
            left, right = self.rng.sample(self.synonym_groups, 2)
            pool.append((self.rng.choice(sorted(left)), self.rng.choice(sorted(right))))
        pool = uniqify(pool)
        while len(pool) < num_samples and max_iter > 0:
            max_iter -= 1
            pool += self.soft_nonsynonym_sampling(num_samples - len(pool), max_iter)
            pool = uniqify(pool)
        return pool

    def hard_nonsynonym_sampling(
        self,
        num_samples: int,
        sibling_groups: list[list[str]],
        max_iter: int = 5,
    ) -> list[tuple[str, str]]:
        """Label pairs from SIBLING classes, sibling groups chosen with
        size-proportional weights (text_semantics:230-286)."""
        usable = [g for g in sibling_groups if len(g) >= 2]
        if not usable or num_samples <= 0:
            return []
        weights = [len(g) for g in usable]
        pool: list[tuple[str, str]] = []
        chosen = self.rng.choices(usable, weights=weights, k=num_samples)
        for group in chosen:
            a, b = self.rng.sample(group, 2)
            la = sorted(self.index.labels.get(a, []))
            lb = sorted(self.index.labels.get(b, []))
            if la and lb:
                pool.append((self.rng.choice(la), self.rng.choice(lb)))
        pool = uniqify(pool)
        while len(pool) < num_samples and max_iter > 0:
            max_iter -= 1
            pool += self.hard_nonsynonym_sampling(
                num_samples - len(pool), sibling_groups, max_iter
            )
            pool = uniqify(pool)
        return pool


def intra_ontology_corpus(
    index: AnnotationIndex,
    hierarchy: Hierarchy | None = None,
    *,
    soft_negative_ratio: int = 2,
    hard_negative_ratio: int = 2,
    seed: int = 0,
) -> dict:
    """IntraOntologyTextSemanticsCorpus (text_semantics.py:288-345): all
    synonyms; hard negatives first (hard_ratio × synonyms, from siblings),
    soft negatives compensate to (soft+hard) × synonyms total."""
    th = AnnotationThesaurus(index, seed=seed)
    synonyms = th.synonym_sampling()
    siblings = hierarchy.siblings() if hierarchy is not None else []
    num_hard = hard_negative_ratio * len(synonyms)
    hard = th.hard_nonsynonym_sampling(num_hard, siblings)
    num_soft = (soft_negative_ratio + hard_negative_ratio) * len(synonyms) - len(hard)
    soft = th.soft_nonsynonym_sampling(num_soft)
    return {
        "synonyms": synonyms,
        "soft_nonsynonyms": soft,
        "hard_nonsynonyms": hard,
        "summary": {
            "num_synonyms": len(synonyms),
            "num_soft_nonsynonyms": len(soft),
            "num_hard_nonsynonyms": len(hard),
        },
    }


def cross_ontology_corpus(
    class_mappings: list[tuple[str, str]],
    src_index: AnnotationIndex,
    tgt_index: AnnotationIndex,
    *,
    negative_ratio: int = 4,
    seed: int = 0,
) -> dict:
    """CrossOntologyTextSemanticsCorpus (text_semantics.py:347-485):
    synonyms = label cartesian products of matched class pairs (identity
    pairs removed, both directions); non-synonyms = random src-label ×
    tgt-label pairs from two DIFFERENT mappings."""
    rng = random.Random(seed)
    synonyms: list[tuple[str, str]] = []
    group_pairs: list[tuple[list[str], list[str]]] = []
    for src_iri, tgt_iri in class_mappings:
        src_labs = sorted(src_index.labels.get(src_iri, []))
        tgt_labs = sorted(tgt_index.labels.get(tgt_iri, []))
        group_pairs.append((src_labs, tgt_labs))
        for l in src_labs:
            for r in tgt_labs:
                if l != r:  # identity covered by the intra corpora
                    synonyms.append((l, r))
                    synonyms.append((r, l))
    synonyms = uniqify(synonyms)
    nonsynonyms: list[tuple[str, str]] = []
    num_negative = negative_ratio * len(synonyms)
    if len(group_pairs) >= 2:
        attempts = 0
        while len(nonsynonyms) < num_negative and attempts < 6 * max(num_negative, 1):
            attempts += 1
            left, right = rng.sample(group_pairs, 2)
            if left[0] and right[1]:
                nonsynonyms.append((rng.choice(left[0]), rng.choice(right[1])))
            if attempts % max(num_negative, 1) == 0:
                nonsynonyms = uniqify(nonsynonyms)
        nonsynonyms = uniqify(nonsynonyms)
    return {
        "synonyms": synonyms,
        "nonsynonyms": nonsynonyms,
        "summary": {
            "num_synonyms": len(synonyms),
            "num_nonsynonyms": len(nonsynonyms),
            "num_mappings": len(class_mappings),
        },
    }


# ---------------------------------------------------------------------------
# Thesaurus (WordNet-analogue) sub-corpus — B3 completion without network.
#
# The reference's WordNetCorpus (thesaurus_corpus.py:14-97) tokenizes the
# ontology's annotation labels, drops stopwords/digits/punctuation, then
# emits (token, lemma) synonym pairs and (token, antonym) nonsynonym pairs
# from WordNet. NLTK data is unavailable in this container, so the lookup
# table is pluggable: pass any {word: {"synonyms": [...], "antonyms": [...]}}
# dict; BUILTIN_THESAURUS below is a small hand-written public-domain
# synonym/antonym table covering the engine's schema/commerce vocabulary.

_THESAURUS_STOPWORDS = frozenset(
    "a an and are as at be by for from has he in is it its of on that the to "
    "was were will with i this or not".split()
)

BUILTIN_THESAURUS: dict[str, dict[str, list[str]]] = {
    "customer": {"synonyms": ["client", "patron", "buyer"], "antonyms": ["seller"]},
    "supplier": {"synonyms": ["vendor", "provider", "seller"], "antonyms": ["buyer"]},
    "order": {"synonyms": ["purchase", "request"], "antonyms": []},
    "part": {"synonyms": ["component", "piece", "portion"], "antonyms": ["whole"]},
    "nation": {"synonyms": ["country", "state", "land"], "antonyms": []},
    "region": {"synonyms": ["area", "zone", "territory"], "antonyms": []},
    "account": {"synonyms": ["record", "ledger"], "antonyms": []},
    "balance": {"synonyms": ["remainder", "equilibrium"], "antonyms": ["imbalance"]},
    "price": {"synonyms": ["cost", "charge", "rate"], "antonyms": []},
    "ship": {"synonyms": ["send", "dispatch", "transport"], "antonyms": ["receive"]},
    "date": {"synonyms": ["day", "time"], "antonyms": []},
    "name": {"synonyms": ["title", "label"], "antonyms": []},
    "address": {"synonyms": ["location", "residence"], "antonyms": []},
    "phone": {"synonyms": ["telephone"], "antonyms": []},
    "comment": {"synonyms": ["remark", "note", "annotation"], "antonyms": []},
    "total": {"synonyms": ["sum", "aggregate", "whole"], "antonyms": ["part"]},
    "priority": {"synonyms": ["precedence", "urgency"], "antonyms": []},
    "status": {"synonyms": ["state", "condition"], "antonyms": []},
    "segment": {"synonyms": ["section", "division", "part"], "antonyms": ["whole"]},
    "quantity": {"synonyms": ["amount", "number", "count"], "antonyms": []},
    "discount": {"synonyms": ["reduction", "rebate"], "antonyms": ["surcharge"]},
    "tax": {"synonyms": ["levy", "duty"], "antonyms": []},
    "clerk": {"synonyms": ["assistant", "registrar"], "antonyms": []},
    "key": {"synonyms": ["identifier", "index"], "antonyms": []},
    "large": {"synonyms": ["big", "great", "sizable"], "antonyms": ["small"]},
    "small": {"synonyms": ["little", "minor", "tiny"], "antonyms": ["large"]},
    "open": {"synonyms": ["unsealed", "accessible"], "antonyms": ["closed"]},
    "closed": {"synonyms": ["shut", "sealed"], "antonyms": ["open"]},
}


def _thesaurus_tokens(index: AnnotationIndex) -> set[str]:
    """Ontology annotation labels -> lowercased content tokens
    (thesaurus_corpus.py:67-73: drop punctuation-only, digit-led and
    stopword tokens; strip ['/_-] to spaces)."""
    import re

    tokens: set[str] = set()
    for labels in index.labels.values():
        for lab in labels:
            for tok in re.findall(r"[A-Za-z0-9'_/-]+", lab):
                if re.match(r"\d+", tok):
                    continue
                low = tok.lower()
                if low in _THESAURUS_STOPWORDS:
                    continue
                cleaned = re.sub(r"['/_-]", " ", low).strip()
                if cleaned:
                    tokens.add(cleaned)
    return tokens


def thesaurus_corpus(
    index: AnnotationIndex,
    thesaurus: dict[str, dict[str, list[str]]] | None = None,
) -> dict:
    """WordNetCorpus analogue (thesaurus_corpus.py:14-97): synonyms =
    (ontology token, thesaurus lemma) with lemma != token; nonsynonyms =
    (token, first antonym). Deterministic — no sampling."""
    thesaurus = BUILTIN_THESAURUS if thesaurus is None else thesaurus
    tokens = _thesaurus_tokens(index)
    synonyms: list[tuple[str, str]] = []
    nonsynonyms: list[tuple[str, str]] = []
    for token in sorted(tokens):
        entry = thesaurus.get(token)
        if not entry:
            continue
        for name in entry.get("synonyms", []):
            if name.lower() != token:
                synonyms.append((token, name.lower()))
        ants = entry.get("antonyms", [])
        if ants:
            nonsynonyms.append((token, ants[0].lower()))
    return {
        "synonyms": synonyms,
        "nonsynonyms": nonsynonyms,
        "summary": {
            "num_synonyms": len(synonyms),
            "num_nonsynonyms": len(nonsynonyms),
            "num_ontology_tokens": len(tokens),
        },
    }


def text_semantics_corpora(
    src_index: AnnotationIndex,
    tgt_index: AnnotationIndex,
    *,
    src_hierarchy: Hierarchy | None = None,
    tgt_hierarchy: Hierarchy | None = None,
    class_mappings: list[tuple[str, str]] | None = None,
    thesaurus: dict[str, dict[str, list[str]]] | None | bool = True,
    seed: int = 0,
) -> dict:
    """TextSemanticsCorpora (text_semantics.py:486-584): intra-src +
    intra-tgt (+ cross when mappings exist) + thesaurus sub-corpus (the
    WordNetCorpus analogue over the src ontology's tokens — pass a custom
    ``{word: {synonyms, antonyms}}`` dict, ``True`` for the bundled
    ``BUILTIN_THESAURUS``, or ``False``/``None`` to skip), merged with
    order-preserving dedup and the nonsynonym − synonym subtraction.

    Output matches the reference's saved artifact: labelled (a, b, 1|0)
    pairs + per-sub-corpus summary — the exact input of the B2 fine-tune
    seam (``linking.trainer``)."""
    synonyms: list[tuple[str, str]] = []
    nonsynonyms: list[tuple[str, str]] = []
    intra_src = intra_ontology_corpus(src_index, src_hierarchy, seed=seed)
    intra_tgt = intra_ontology_corpus(tgt_index, tgt_hierarchy, seed=seed + 1)
    for sub in (intra_src, intra_tgt):
        synonyms += sub["synonyms"]
        nonsynonyms += sub["soft_nonsynonyms"] + sub["hard_nonsynonyms"]
    cross = None
    if class_mappings:
        cross = cross_ontology_corpus(
            class_mappings, src_index, tgt_index, seed=seed + 2
        )
        synonyms += cross["synonyms"]
        nonsynonyms += cross["nonsynonyms"]
    thes = None
    if thesaurus:
        thes = thesaurus_corpus(
            src_index, None if thesaurus is True else thesaurus
        )
        synonyms += thes["synonyms"]
        nonsynonyms += thes["nonsynonyms"]
    synonyms = uniqify(synonyms)
    nonsynonyms = uniqify(nonsynonyms)
    syn_set = set(synonyms)
    # remove false negatives (text_semantics.py:553-557)
    nonsynonyms = [p for p in nonsynonyms if p not in syn_set]
    return {
        "synonyms": [(a, b, 1) for a, b in synonyms],
        "nonsynonyms": [(a, b, 0) for a, b in nonsynonyms],
        "summary": {
            "num_synonyms": len(synonyms),
            "num_nonsynonyms": len(nonsynonyms),
            "intra_src": intra_src["summary"],
            "intra_tgt": intra_tgt["summary"],
            "cross": cross["summary"] if cross else None,
            "thesaurus": thes["summary"] if thes else None,
        },
    }
