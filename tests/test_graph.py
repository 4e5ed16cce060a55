"""Distributed PageRank vs the dense local reference."""

import numpy as np
import pandas as pd
import pytest


def _graph(n_nodes: int = 40, seed: int = 21) -> pd.DataFrame:
    """Random 3-out-regular digraph (no dangling nodes)."""
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_nodes):
        for v in rng.choice([x for x in range(n_nodes) if x != u], 3,
                            replace=False):
            rows.append((f"h{u}", f"h{v}"))
    return pd.DataFrame(rows, columns=["src", "dst"])


def test_matches_local_reference(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.graph import pagerank, pagerank_local

    df = _graph()
    ranks = (pagerank(rd.from_pandas(df).repartition(4), iters=8, mode="shuffle")
             .to_pandas().set_index("node")["rank"])
    ref = pagerank_local(df, iters=8)
    np.testing.assert_allclose(ranks.reindex(ref.index).to_numpy(),
                               ref.to_numpy(), rtol=0, atol=1e-12)
    # a proper distribution on a dangling-free graph
    assert ranks.sum() == pytest.approx(1.0, abs=1e-9)


def test_hub_ranks_highest(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.graph import pagerank

    # star: everyone links to hub; hub links back to one node
    rows = [(f"s{i}", "hub") for i in range(10)] + [("hub", "s0")]
    df = pd.DataFrame(rows, columns=["src", "dst"])
    ranks = pagerank(rd.from_pandas(df), iters=12, mode="shuffle").to_pandas()
    ordered = ranks.sort_values("rank", ascending=False)
    # rank mass ping-pongs between hub and s0 (hub's only out-edge);
    # at any finite iteration those two dominate the other spokes
    assert set(ordered.head(2)["node"]) == {"hub", "s0"}
    assert ordered.iloc[1]["rank"] > 10 * ordered.iloc[2]["rank"]


def test_partitioning_invariance(ray_session):
    import ray.data as rd

    from ocgis_ray.parity import sql_round
    from ocgis_ray.stages.graph import pagerank

    df = _graph(25, seed=3)
    a = (pagerank(rd.from_pandas(df).repartition(1), iters=5, mode="shuffle").to_pandas()
         .sort_values("node").reset_index(drop=True))
    b = (pagerank(rd.from_pandas(df).repartition(6), iters=5, mode="shuffle").to_pandas()
         .sort_values("node").reset_index(drop=True))
    assert (sql_round(a["rank"].to_numpy(), 9)
            == sql_round(b["rank"].to_numpy(), 9)).all()


def test_empty_raises(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.graph import pagerank

    empty = rd.from_pandas(pd.DataFrame({"src": [], "dst": []}))
    with pytest.raises(ValueError, match="empty"):
        pagerank(empty)


def test_broadcast_mode_matches_shuffle(ray_session):
    import ray.data as rd

    from ocgis_ray.parity import sql_round
    from ocgis_ray.stages.graph import pagerank

    df = _graph(30, seed=8)
    bc = (pagerank(rd.from_pandas(df), iters=6, mode="broadcast")
          .to_pandas().sort_values("node").reset_index(drop=True))
    sh = (pagerank(rd.from_pandas(df).repartition(3), iters=6,
                   mode="shuffle")
          .to_pandas().sort_values("node").reset_index(drop=True))
    assert list(bc["node"]) == list(sh["node"])
    assert (sql_round(bc["rank"].to_numpy(), 9)
            == sql_round(sh["rank"].to_numpy(), 9)).all()
    # auto picks broadcast for a tiny graph (same values either way)
    au = (pagerank(rd.from_pandas(df), iters=6).to_pandas()
          .sort_values("node").reset_index(drop=True))
    assert (au["rank"].to_numpy() == bc["rank"].to_numpy()).all()
    with pytest.raises(ValueError, match="unknown pagerank mode"):
        pagerank(rd.from_pandas(df), mode="nope")
