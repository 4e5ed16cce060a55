"""SemDeDup: distributed decisions vs a plain-numpy local reference."""

import numpy as np
import pandas as pd
import pytest


def _normalize(m):
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def _corpus(n_base: int = 40, dim: int = 16, dups_per: int = 3,
            noise: float = 1e-3, seed: int = 7):
    """Base vectors plus planted near-duplicate copies (tiny noise)."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_base, dim))
    rows, ids = [], []
    vid = 0
    for i in range(n_base):
        rows.append(base[i])
        ids.append(vid)
        vid += 1
        for _ in range(dups_per if i % 4 == 0 else 0):
            rows.append(base[i] + noise * rng.normal(size=dim))
            ids.append(vid)
            vid += 1
    return np.asarray(ids, np.int64), np.stack(rows)


def _local_semdedup(ids, mat, cent, eps, keep="far"):
    """Brute-force reference: argmax assignment, per-cluster priority
    sort, triangular-max rule (row i dup iff max_{j<i} cos > 1-eps)."""
    m = _normalize(mat.astype(np.float64))
    sims = m @ cent.T
    assign = np.argmax(sims, axis=1)
    cent_sim = sims[np.arange(len(ids)), assign]
    dup_ids = set()
    for c in np.unique(assign):
        rows = np.nonzero(assign == c)[0]
        cs = cent_sim[rows]
        order = np.lexsort((ids[rows], cs if keep == "far" else -cs))
        rows = rows[order]
        sub = m[rows]
        s = sub @ sub.T
        for i in range(1, len(rows)):
            if s[i, :i].max() > 1.0 - eps:
                dup_ids.add(int(ids[rows[i]]))
    return dup_ids


@pytest.fixture(scope="module")
def planted(ray_session):
    import ray.data as rd

    ids, mat = _corpus()
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": ids, "embedding": list(mat)}))
    return ids, mat, ds


@pytest.mark.parametrize("keep", ["far", "near"])
def test_decisions_match_local_reference(planted, keep):
    from ocgis_ray.stages.ann import _kmeans_spherical, semdedup_decisions

    ids, mat, ds = planted
    eps = 0.05
    dec = semdedup_decisions(ds, eps=eps, nlist=8, train_n=10_000,
                             keep=keep).to_pandas()
    cent = _kmeans_spherical(mat, 8)  # same seed/iters as the stage
    expect = _local_semdedup(ids, mat, cent, eps, keep=keep)
    got = set(dec[dec["sem_dup"]]["vec_id"].astype(int))
    assert got == expect
    assert len(expect) > 0  # planted dups must actually trip the rule
    assert set(dec["vec_id"]) == set(ids.tolist())  # one decision per row


def test_chunked_path_identical(planted):
    """Tiny chunk_elems forces many chunk matmuls per cluster — the
    100-TB giant-cluster degradation path must be value-identical."""
    from ocgis_ray.stages.ann import semdedup_decisions

    _, _, ds = planted
    a = semdedup_decisions(ds, eps=0.05, nlist=8, train_n=10_000) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    b = semdedup_decisions(ds, eps=0.05, nlist=8, train_n=10_000,
                           chunk_elems=4) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_survivors_anti_join(planted):
    from ocgis_ray.stages.ann import semdedup_decisions, semdedup_survivors

    ids, _, ds = planted
    dec = semdedup_decisions(ds, eps=0.05, nlist=8, train_n=10_000)
    surv = semdedup_survivors(ds, dec).to_pandas()
    dropped = set(dec.to_pandas().query("sem_dup")["vec_id"].astype(int))
    assert set(surv["vec_id"].astype(int)) == set(ids.tolist()) - dropped
    assert len(surv) + len(dropped) == len(ids)


def test_eps_extremes(planted):
    from ocgis_ray.stages.ann import semdedup_decisions

    ids, _, ds = planted
    # eps=0: dup needs cos > 1.0 — impossible, everything survives
    dec0 = semdedup_decisions(ds, eps=0.0, nlist=8, train_n=10_000).to_pandas()
    assert not dec0["sem_dup"].any()
    # eps=2: threshold -1, every non-first cluster member is a dup —
    # exactly one survivor per cluster
    dec2 = semdedup_decisions(ds, eps=2.0, nlist=8, train_n=10_000).to_pandas()
    keep = dec2[~dec2["sem_dup"]]
    assert len(keep) == dec2["cluster"].nunique()
    # the survivor is the cluster-edge member (min cent_sim, tie on id)
    for c, g in dec2.groupby("cluster"):
        g = g.sort_values(["cent_sim", "vec_id"])
        assert not g.iloc[0]["sem_dup"]


def test_deterministic(planted):
    from ocgis_ray.stages.ann import semdedup_decisions

    _, _, ds = planted
    a = semdedup_decisions(ds, eps=0.05, nlist=8, train_n=10_000) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    b = semdedup_decisions(ds, eps=0.05, nlist=8, train_n=10_000) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
