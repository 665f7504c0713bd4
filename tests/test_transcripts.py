"""End-to-end tests of the flagship transcript pipeline (north_rule):
ordering invariant, triple extraction, determinism across parallelism."""

import pandas as pd
import pyarrow as pa

from knowledgegraphs_ray.pipelines.transcripts import (
    extract_transcript_triples,
    ordered_transcripts,
    synth_transcripts,
    transcripts_from_events,
)


def _triple_set(ds) -> set[tuple]:
    df = ds.to_pandas()
    return set(map(tuple, df[["subj", "pred", "obj"]].itertuples(index=False)))


def test_synth_deterministic_across_parallelism():
    a = synth_transcripts(30, seed=7, parallelism=1).to_pandas()
    b = synth_transcripts(30, seed=7, parallelism=4).to_pandas()
    key = ["conv_id", "turn_idx"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_ordering_invariant_text_equality():
    """north_rule per-row invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering — the ordered pipeline must preserve text
    exactly even though synth rows are shuffled within conversations."""
    ds = synth_transcripts(25, seed=3)
    raw = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ordered = ordered_transcripts(ds).to_pandas()
    # within each conversation the order is by turn_idx
    for _, g in ordered.groupby("conv_id"):
        assert list(g["turn_idx"]) == sorted(g["turn_idx"])
    ordered = ordered.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (ordered["text"] == raw["text"]).all()


def test_transcript_triples_shape():
    ds = synth_transcripts(10, seed=1)
    trips = _triple_set(extract_transcript_triples(ds))
    convs = {s for s, p, o in trips if o == "kg:Conversation"}
    assert len(convs) == 10
    # every turn has text + role triples and a link to its conversation
    turns = {s for s, p, o in trips if o == "kg:Turn"}
    linked = {s for s, p, o in trips if p == "kg:p_turn_conversation"}
    assert turns == linked


def test_triples_identical_at_two_parallelism_levels():
    """FIXTURES.md F5: identical triple sets at different block counts."""
    t1 = _triple_set(extract_transcript_triples(synth_transcripts(20, seed=5, parallelism=1)))
    t2 = _triple_set(extract_transcript_triples(synth_transcripts(20, seed=5, parallelism=4)))
    assert t1 == t2


def test_transcripts_from_events(sf_dir):
    tds = transcripts_from_events(sf_dir)
    df = tds.to_pandas()
    assert set(df.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    # turn_idx dense 0..n-1 per conversation, ts non-decreasing along it
    for _, g in df.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        assert list(g["turn_idx"]) == list(range(len(g)))
        assert g["ts"].is_monotonic_increasing


def test_segrank_matches_group_strategy(sf_dir):
    """The vectorized sort+segment-rank derivation is row-identical to the
    literal groupby(user_id)+per-group-sort reference path."""
    import pandas as pd

    a = (
        transcripts_from_events(sf_dir)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = (
        transcripts_from_events(sf_dir, strategy="group")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_sorted_segment_rank_straddling_blocks():
    """Keys spanning many tiny blocks get correct cross-block offsets."""
    import numpy as np
    import pandas as pd
    import ray.data

    from knowledgegraphs_ray.util.segrank import sorted_segment_rank

    rng = np.random.default_rng(0)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, n),  # few hot keys -> every block boundary straddles
            "o": rng.permutation(n),
            "u": np.arange(n),
        }
    )
    ds = ray.data.from_pandas(df).repartition(23)
    out = sorted_segment_rank(
        ds, key_cols=["k"], order_cols=["o", "u"], rank_col="r", dtype="int64"
    ).to_pandas()
    expect = df.sort_values(["k", "o", "u"]).reset_index(drop=True)
    expect["r"] = expect.groupby("k").cumcount()
    got = out.sort_values(["k", "o", "u"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "o", "u", "r"]].astype({"r": "int64"}), expect)


def test_sorted_segment_cumsum_straddling_blocks():
    """Inclusive per-key running sum with keys spanning many tiny blocks —
    the carry threads the trailing-run sum into the next block's first run."""
    import numpy as np
    import pandas as pd
    import ray.data

    from knowledgegraphs_ray.util.segrank import sorted_segment_cumsum

    rng = np.random.default_rng(1)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, n),
            "o": rng.permutation(n),
            "v": rng.integers(-50, 200, n),
        }
    )
    ds = ray.data.from_pandas(df).repartition(23)
    out = sorted_segment_cumsum(
        ds, key_cols=["k"], order_cols=["o"], val_col="v", out_col="cum"
    ).to_pandas()
    expect = df.sort_values(["k", "o"]).reset_index(drop=True)
    expect["cum"] = expect.groupby("k")["v"].cumsum()
    got = out.sort_values(["k", "o"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "o", "v", "cum"]].astype({"cum": "int64"}),
        expect.astype({"cum": "int64"}),
    )


def test_context_window_assume_sorted_matches_default():
    """assume_sorted=True on a pre-sorted input (the flagship's one-sort
    chain) must equal the sorting path bit-for-bit — including nulls in the
    text column and runs straddling tiny blocks."""
    import pandas as pd

    from knowledgegraphs_ray.pipelines.transcripts import (
        synth_transcripts,
        with_context_window,
    )

    ds = synth_transcripts(12, seed=3).repartition(17)
    pre = ds.sort(["conv_id", "turn_idx"])
    key = ["conv_id", "turn_idx"]
    a = (
        with_context_window(pre, k=2, assume_sorted=True)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    b = (
        with_context_window(ds, k=2)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(a[cols], b[cols])


def test_context_window_halo_matches_group_strategy():
    """Halo-exchange context == per-conversation reference, across block
    boundaries and with blocks smaller than the window."""
    import pandas as pd

    from knowledgegraphs_ray.pipelines.transcripts import (
        synth_transcripts,
        with_context_window,
    )

    ds = synth_transcripts(12, seed=3).repartition(17)  # tiny straddling blocks
    key = ["conv_id", "turn_idx"]
    a = (
        with_context_window(ds, k=2)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    b = (
        with_context_window(ds, k=2, strategy="group")
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    cols = sorted(a.columns)
    assert "context" in cols
    pd.testing.assert_frame_equal(a[cols], b[cols])


# ---------------------------------------------------------------------------
# Transcript analytics: tool transitions + conversation stats


def _toy_transcripts() -> "ray.data.Dataset":
    import ray.data

    df = pd.DataFrame(
        {
            "conv_id": ["a"] * 4 + ["b"] * 3 + ["c"] * 1,
            "turn_idx": [0, 1, 2, 3, 0, 1, 2, 0],
            "role": [
                "user", "assistant", "tool", "assistant",
                "user", "tool", "tool",
                "system",
            ],
            "text": ["hi", "run", None, "done", "x", "y", "zz", "s"],
            "tool": [None, "search", "db", None, "code", "db", "db", None],
        }
    )
    return ray.data.from_pandas(df).repartition(3)


def test_tool_transitions_toy():
    from knowledgegraphs_ray.pipelines.transcripts import tool_transitions

    got = (
        tool_transitions(_toy_transcripts())
        .to_pandas()
        .sort_values(["tool_from", "tool_to"])
        .reset_index(drop=True)
    )
    # conv a: None->search, search->db, db->None => only (search, db)
    # conv b: code->db, db->db
    # conv c: single turn, nothing; conv boundaries never pair (a.3 -/-> b.0)
    want = pd.DataFrame(
        {
            "tool_from": ["code", "db", "search"],
            "tool_to": ["db", "db", "db"],
            "n_transitions": [1, 1, 1],
        }
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_transitions": "int64"}), want.astype({"n_transitions": "int64"}),
        check_dtype=False,
    )


def test_conversation_stats_toy_and_block_straddle():
    import ray.data

    from knowledgegraphs_ray.pipelines.transcripts import conversation_stats

    ds = _toy_transcripts()
    got = (
        conversation_stats(ds).to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "conv_id": ["a", "b", "c"],
            "n_turns": [4, 3, 1],
            "n_user": [1, 1, 0],
            "n_assistant": [2, 0, 0],
            "n_tool_calls": [1, 2, 0],
            "total_chars": [2 + 3 + 0 + 4, 1 + 1 + 2, 1],
        }
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # partials must merge identically when a conversation straddles blocks
    one_block = (
        conversation_stats(ds.repartition(1))
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, one_block, check_dtype=False)


def test_ordered_concat_per_group_straddle_and_nulls():
    import ray.data

    from knowledgegraphs_ray.util.segrank import ordered_concat_per_group

    df = pd.DataFrame(
        {
            "k": ["a"] * 5 + ["b"] * 2 + ["c"] * 2,
            "o": [2, 0, 1, 4, 3, 1, 0, 0, 1],
            "t": ["C", "A", "B", "E", "D", "y", "x", None, None],
        }
    )
    for nblocks in (1, 4, 9):
        got = (
            ordered_concat_per_group(
                ray.data.from_pandas(df).repartition(nblocks),
                key_cols=["k"],
                order_cols=["o"],
                text_col="t",
                sep="|",
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = pd.DataFrame({"k": ["a", "b"], "agg_text": ["A|B|C|D|E", "x|y"]})
        # group c is all-null -> omitted (string_agg semantics)
        pd.testing.assert_frame_equal(
            got.astype(str), want.astype(str), check_dtype=False
        ), nblocks


def test_conversation_fingerprints_matches_hashlib():
    import hashlib

    import ray.data

    from knowledgegraphs_ray.pipelines.transcripts import conversation_fingerprints

    df = pd.DataFrame(
        {
            "conv_id": ["a", "a", "a", "b"],
            "turn_idx": [1, 0, 2, 0],
            "text": ["mid", "first", "last", "solo"],
        }
    )
    got = (
        conversation_fingerprints(ray.data.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    want_a = hashlib.md5("first\x1fmid\x1flast".encode()).hexdigest()
    want_b = hashlib.md5("solo".encode()).hexdigest()
    assert list(got["conv_md5"]) == [want_a, want_b]
