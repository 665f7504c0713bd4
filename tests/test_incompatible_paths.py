"""selectFromIncompatiblePaths vote cascade (MappingSelection.java:233-295)."""

import pandas as pd

from knowledgegraphs_ray.linking.nary import select_from_incompatible_paths
from knowledgegraphs_ray.rules.hierarchy import Hierarchy

H = Hierarchy.build([("kg:Dog", "kg:Mammal"), ("kg:Rock", "kg:Mineral")])


def _df(rows):
    return pd.DataFrame(rows, columns=["cand_iri", "bes", "pj", "pj_rank"])


def test_incompatible_obj_wins_both_votes_drops_class():
    obj = _df([("do:hasPet", 0.9, 0.9, 1)])
    cls = _df([("kg:Rock", 0.5, 0.5, 1)])  # incompatible with hasPet's range
    o, c, d = select_from_incompatible_paths(
        obj, cls, None, H, ranges={"do:hasPet": "kg:Mammal"}
    )
    assert o == "do:hasPet" and c is None


def test_compatible_pair_keeps_both_despite_votes():
    obj = _df([("do:hasPet", 0.9, 0.9, 1)])
    cls = _df([("kg:Dog", 0.5, 0.5, 1)])  # Dog compatible with range Mammal
    o, c, _ = select_from_incompatible_paths(
        obj, cls, None, H, ranges={"do:hasPet": "kg:Mammal"}
    )
    assert o == "do:hasPet" and c == "kg:Dog"


def test_tied_votes_keep_both():
    obj = _df([("do:a", 0.9, 0.2, 1)])  # wins bes
    cls = _df([("kg:Rock", 0.2, 0.9, 1)])  # wins pj
    o, c, _ = select_from_incompatible_paths(obj, cls, None, H, ranges={"do:a": "kg:Mammal"})
    assert o == "do:a" and c == "kg:Rock"


def test_data_optimal_constrained_to_compatible_domain():
    cls = _df([("kg:Dog", 0.9, 0.9, 1)])
    data = _df([("do:weight", 0.9, 0.9, 1), ("do:hardness", 0.95, 0.95, 1)])
    o, c, d = select_from_incompatible_paths(
        None,
        cls,
        data,
        H,
        domains={"do:weight": "kg:Mammal", "do:hardness": "kg:Mineral"},
    )
    # hardness scores higher but its domain (Mineral) is incompatible with Dog
    assert c == "kg:Dog" and d == "do:weight"
