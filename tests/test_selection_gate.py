"""Branch-level expectations for the mapping-selection oracle gate."""

from __future__ import annotations

import pandas as pd

from knowledgegraphs_ray.linking.selection_gate import mapping_selection


def _result() -> pd.DataFrame:
    return mapping_selection("/root/testdata/sf0.001").to_pandas()


def test_every_branch_selects_expected_candidate():
    df = _result()
    opt = df[df.stage == "optimal"].set_index("mention")
    # scen 0 (gid 0): rank-tied pair (w2, w3x) resolved by bes desc -> w3x;
    # the pj-rank-1 candidate w4 failed the threshold filter.
    assert opt.loc["m00000", "cand_iri"] == "kg:w3x"
    assert opt.loc["m00000", "sel_rank"] == 2
    # scen 1 (gid 1): lo clause, rank tie (v0, v2) -> bes desc -> v0.
    assert opt.loc["m00001", "cand_iri"] == "kg:v0"
    # scen 2 (gid 2): nothing passes the optimal cascade.
    assert not opt.index.str.startswith("m00002 ").any()
    # scen 3 sub 0 (gid 3): specialize — child survives, ancestor dropped.
    assert opt.loc["m00003", "cand_iri"] == "kg:h3_base_sub"
    # scen 3 sub 1 (gid 8): generalize — ancestor survives.
    assert opt.loc["m00008", "cand_iri"] == "kg:h8_base"
    # scen 4 sub 0 (gid 4): sibling-best by (pj_rank, -bes) -> sb.
    assert opt.loc["m00004", "cand_iri"] == "kg:g4_p_sb"
    # scen 4 sub 1 (gid 9): beyond DEPTH_THRS — both survive, rank picks d_a.
    assert opt.loc["m00009", "cand_iri"] == "kg:d9_a"
    # one selection per non-salvage mention group
    assert len(opt) == 80

    sal = df[df.stage == "salvage"]
    g2 = sal[sal.mention.str.startswith("m00002 ")]
    ranks = dict(zip(g2.cand_iri, g2.sel_rank))
    # sub 0: row0 kept via overlap rank (2), unranked survivor gets 201,
    # the running-min clause recovers rank 1; 'beta' and the bes=-1 row drop.
    assert ranks == {"kg:alpha_beta": 2, "kg:zz_qq": 201, "kg:alpha_beta_gamma": 1}
    g7 = sal[sal.mention.str.startswith("m00007 ")]  # sub 1
    ranks7 = dict(zip(g7.cand_iri, g7.sel_rank))
    assert ranks7 == {"kg:qq_zz": 201, "kg:zz_qq": 201, "kg:alpha_beta_gamma": 1}
    g12 = sal[sal.mention.str.startswith("m00012 ")]  # sub 2: row0 NOT kept
    assert dict(zip(g12.cand_iri, g12.sel_rank)) == {"kg:alpha_beta_gamma": 1}
    assert len(sal) == 7 * 3 + 7 * 3 + 6 * 1
