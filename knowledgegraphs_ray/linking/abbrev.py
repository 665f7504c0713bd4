"""Abbreviation expansion — the AAExpansion pipeline re-expressed (X1-X6).

Reference: AAExpansion/source/InterpretHeaders.py:31-102 — headers are
tokenized, abbreviations detected against a SF->LF dictionary
(MedicalDictionary.py:189-279 letter-tries), candidates scored with BioBERT
cosine (BertSimilarityModel.py), filtered in two rounds, near-dup grouped and
vote-selected (NearDuplicates.py + UnionFind).

Model-free surrogate scorer (deterministic, FIXTURES.md F4): a full form
scores against its abbreviation by initials agreement + character coverage;
context score = char-ngram similarity to the OTHER mentions in the same
source. The pipeline shape (broadcast dictionary, dedup-score, per-abbrev
vote groups) matches the reference; the scorer is the swap-in point for a
real embedding model.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
import ray
import ray.data

from knowledgegraphs_ray.canon.canonicalize import _near_dup_groups
from knowledgegraphs_ray.linking.mentions import normalize_label
from knowledgegraphs_ray.linking.scorer import char_ngrams, jaccard

FILTER_THRESHOLD = 0.55  # X3 two-round filter analogue (ref: 0.82 on BERT cos)


def initials_score(abbrev: str, full_form: str) -> float:
    """Fraction of the abbreviation's letters explained as word initials of
    the full form, in order (e.g. hr -> heart rate = 1.0)."""
    a = normalize_label(abbrev).replace(" ", "")
    words = normalize_label(full_form).split()
    if not a or not words:
        return 0.0
    initials = [w[0] for w in words]
    i = j = hits = 0
    while i < len(a) and j < len(initials):
        if a[i] == initials[j]:
            hits += 1
            i += 1
        j += 1
    return hits / len(a)


def char_coverage(abbrev: str, full_form: str) -> float:
    """Are the abbreviation's characters a subsequence of the full form?"""
    a = normalize_label(abbrev).replace(" ", "")
    f = normalize_label(full_form).replace(" ", "")
    it = iter(f)
    hits = sum(1 for ch in a if ch in it)
    return hits / max(len(a), 1)


def surrogate_expansion_score(abbrev: str, full_form: str) -> float:
    return 0.6 * initials_score(abbrev, full_form) + 0.4 * char_coverage(abbrev, full_form)


@dataclass
class AbbrevCandidate:
    mention: str
    abbrev: str
    full_form: str
    score: float
    ctx_score: float
    rank: int = 0


class AbbrevExpander:
    """map_batches stage over mention rows (id, mention, context).

    __init__ pulls the broadcast SF->LF dictionary once (the trie-build /
    embedding-cache analogue, B5); __call__ detects abbreviations and emits
    scored candidate rows."""

    def __init__(self, dict_ref, *, mention_col: str = "mention", context_col: str | None = None):
        d = ray.get(dict_ref) if not isinstance(dict_ref, dict) else dict_ref
        self.sf2lf = {normalize_label(k): v for k, v in d.items()}
        self.mention_col = mention_col
        self.context_col = context_col
        self._score_cache: dict[tuple[str, str], float] = {}

    def _score(self, abbrev: str, lf: str) -> float:
        key = (abbrev, lf)
        s = self._score_cache.get(key)
        if s is None:
            s = surrogate_expansion_score(abbrev, lf)
            self._score_cache[key] = s
        return s

    def __call__(self, batch) -> pd.DataFrame:
        df = batch.to_pandas() if not isinstance(batch, pd.DataFrame) else batch
        rows = []
        for _, r in df.iterrows():
            mention = r[self.mention_col]
            ctx = r[self.context_col] if self.context_col else ""
            ctx_grams = char_ngrams(normalize_label(ctx)) if ctx else set()
            for tok in normalize_label(mention).split():
                lfs = self.sf2lf.get(tok)
                if not lfs:
                    continue
                for lf in lfs:
                    s = self._score(tok, lf)
                    cs = jaccard(char_ngrams(normalize_label(lf)), ctx_grams) if ctx_grams else 0.0
                    rows.append((mention, tok, lf, s, cs))
        out = pd.DataFrame(
            rows, columns=["mention", "abbrev", "full_form", "score", "ctx_score"]
        )
        if out.empty:
            out = pd.DataFrame(
                {
                    "mention": pd.Series([], dtype=str),
                    "abbrev": pd.Series([], dtype=str),
                    "full_form": pd.Series([], dtype=str),
                    "score": pd.Series([], dtype=float),
                    "ctx_score": pd.Series([], dtype=float),
                }
            )
        return out


def select_expansions(scored: ray.data.Dataset, *, threshold: float = FILTER_THRESHOLD) -> ray.data.Dataset:
    """X3+X5: filter below-threshold candidates, near-dup group full forms
    per abbreviation (union-find), vote by group size then max score, pick
    the winning group's best-scored full form."""

    def per_abbrev(g: pd.DataFrame) -> pd.DataFrame:
        g = g[(g["score"] >= threshold) | (g["ctx_score"] >= threshold)]
        if g.empty:
            return pd.DataFrame(
                {
                    "abbrev": pd.Series([], dtype=str),
                    "expansion": pd.Series([], dtype=str),
                    "score": pd.Series([], dtype=float),
                    "n_votes": pd.Series([], dtype="int64"),
                }
            )
        forms = sorted(g["full_form"].unique())
        rep = _near_dup_groups(forms, 0.7)
        g = g.assign(group=g["full_form"].map(rep))
        votes = (
            g.groupby("group")
            .agg(n_votes=("full_form", "size"), best=("score", "max"))
            .sort_values(["n_votes", "best", "group"], ascending=[False, False, True])
        )
        win = votes.index[0]
        sub = g[g["group"] == win].sort_values(
            ["score", "full_form"], ascending=[False, True], kind="mergesort"
        )
        return pd.DataFrame(
            {
                "abbrev": [g["abbrev"].iloc[0]],
                "expansion": [sub["full_form"].iloc[0]],
                "score": [float(sub["score"].iloc[0])],
                "n_votes": [int(votes.loc[win, "n_votes"])],
            }
        )

    return scored.groupby("abbrev").map_groups(per_abbrev, batch_format="pandas")


def expand_abbreviations(
    mentions: ray.data.Dataset,
    dictionary: dict[str, list[str]],
    *,
    mention_col: str = "mention",
    context_col: str | None = None,
    threshold: float = FILTER_THRESHOLD,
) -> ray.data.Dataset:
    ref = ray.put(dictionary)
    scored = mentions.map_batches(
        AbbrevExpander(ref, mention_col=mention_col, context_col=context_col),
        batch_format="pyarrow",
    )
    return select_expansions(scored, threshold=threshold)
