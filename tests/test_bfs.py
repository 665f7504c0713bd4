"""Multi-source BFS: driver CSR sweep vs distributed Bellman-Ford rounds,
depth cap, directedness, seed selection."""

import pandas as pd
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.graph.bfs import bfs_depths


def _edges(rows) -> ray.data.Dataset:
    df = pd.DataFrame(rows, columns=["src", "dst"])
    return ray.data.from_arrow(
        pa.table(
            {"src": pa.array(df["src"], pa.large_string()),
             "dst": pa.array(df["dst"], pa.large_string())}
        )
    ).repartition(3)


# seed/a, chain a->b->c->d, island x<->y, and a shortcut seed2->c
ROWS = [
    ("seed/a", "b"),
    ("b", "c"),
    ("c", "d"),
    ("x", "y"),
    ("seed/2", "c"),
]


def _depths(ds) -> dict[str, int]:
    df = ds.to_pandas()
    return dict(zip(df["node"].astype(str), df["depth"].astype(int)))


def test_driver_bfs_multi_source_min_depth():
    got = _depths(bfs_depths(_edges(ROWS), seed_prefix="seed/", max_depth=8))
    # c is 2 hops from seed/a but 1 hop from seed/2 -> min wins
    assert got == {"seed/a": 0, "seed/2": 0, "b": 1, "c": 1, "d": 2}


def test_depth_cap_and_unreachable_excluded():
    got = _depths(bfs_depths(_edges(ROWS), seed_prefix="seed/", max_depth=1))
    assert got == {"seed/a": 0, "seed/2": 0, "b": 1, "c": 1}
    # x / y are unreachable at any cap
    got8 = _depths(bfs_depths(_edges(ROWS), seed_prefix="seed/", max_depth=8))
    assert "x" not in got8 and "y" not in got8


def test_directed_follows_edge_direction():
    rows = [("seed/a", "b"), ("c", "b")]  # c points AT b; undirected would reach c
    got = _depths(
        bfs_depths(_edges(rows), seed_prefix="seed/", max_depth=8, undirected=False)
    )
    assert got == {"seed/a": 0, "b": 1}
    und = _depths(bfs_depths(_edges(rows), seed_prefix="seed/", max_depth=8))
    assert und == {"seed/a": 0, "b": 1, "c": 2}


def test_tier_equivalence_driver_vs_propagation():
    for cap in (1, 2, 8):
        drv = _depths(bfs_depths(_edges(ROWS), seed_prefix="seed/", max_depth=cap))
        dist = _depths(
            bfs_depths(
                _edges(ROWS), seed_prefix="seed/", max_depth=cap,
                driver_edge_limit=0,
            )
        )
        assert drv == dist, f"tier mismatch at max_depth={cap}"


def test_no_seeds_empty_result():
    out = bfs_depths(_edges(ROWS), seed_prefix="nope/", max_depth=4)
    assert out.count() == 0
    out_dist = bfs_depths(
        _edges(ROWS), seed_prefix="nope/", max_depth=4, driver_edge_limit=0
    )
    assert out_dist.count() == 0


def test_broadcast_tier_matches_driver():
    for cap in (1, 8):
        drv = _depths(bfs_depths(_edges(ROWS), seed_prefix="seed/", max_depth=cap))
        bc = _depths(
            bfs_depths(
                _edges(ROWS), seed_prefix="seed/", max_depth=cap, tier="broadcast"
            )
        )
        assert drv == bc, f"broadcast tier mismatch at max_depth={cap}"
    # directed too
    rows = [("seed/a", "b"), ("c", "b")]
    drv = _depths(
        bfs_depths(_edges(rows), seed_prefix="seed/", max_depth=8, undirected=False)
    )
    bc = _depths(
        bfs_depths(
            _edges(rows), seed_prefix="seed/", max_depth=8,
            undirected=False, tier="broadcast",
        )
    )
    assert drv == bc


def test_broadcast_node_limit_raises():
    import pytest

    with pytest.raises(RuntimeError, match="node_driver_limit"):
        bfs_depths(
            _edges(ROWS), seed_prefix="seed/", max_depth=8,
            tier="broadcast", node_driver_limit=2,
        )


def test_directed_join_tier_matches_driver():
    rows = [("seed/a", "b"), ("c", "b"), ("b", "d")]
    drv = _depths(
        bfs_depths(_edges(rows), seed_prefix="seed/", max_depth=8, undirected=False)
    )
    jn = _depths(
        bfs_depths(
            _edges(rows), seed_prefix="seed/", max_depth=8,
            undirected=False, driver_edge_limit=0, tier="join",
        )
    )
    assert drv == jn == {"seed/a": 0, "b": 1, "d": 2}
