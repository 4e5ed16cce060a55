"""ANN: brute-force correctness, LSH recall."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def emb(ray_session, sf_dir):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]).materialize()


@pytest.fixture(scope="module")
def queries(sf_dir):
    from ocgis_ray.stages.ann import load_query_vectors

    return load_query_vectors(sf_dir, [0, 1, 2])


def test_bruteforce_matches_numpy(emb, queries):
    from ocgis_ray.stages.ann import _normalize, ann_bruteforce

    out = ann_bruteforce(emb, queries, k=5).to_pandas()
    pdf = emb.to_pandas()
    mat = _normalize(np.stack(pdf["embedding"].to_numpy()).astype(np.float64))
    ids = pdf["vec_id"].to_numpy()
    for _, qrow in queries.iterrows():
        q = _normalize(np.asarray(qrow["embedding"], dtype=np.float64)[None, :])[0]
        sims = mat @ q
        order = np.lexsort((ids, -sims))[:5]
        expect = ids[order].tolist()
        mine = out[out["query_id"] == qrow["query_id"]].sort_values("rank")["vec_id"].tolist()
        assert mine == expect


def test_self_is_top1(emb, queries):
    from ocgis_ray.stages.ann import ann_bruteforce

    out = ann_bruteforce(emb, queries, k=3).to_pandas()
    top1 = out[out["rank"] == 1].set_index("query_id")["vec_id"]
    for q in queries["query_id"]:
        assert top1[q] == q  # a vector's nearest neighbor is itself


def test_lsh_recall(emb, queries):
    """Synthetic embeddings are near-orthogonal (neighbor cosine ~0.4),
    the hardest regime for hyperplane LSH — collision prob per bit is
    only ~0.63.  6 bits x 16 tables gives expected recall ~0.65 while
    still pruning ~3/4 of candidates; assert a loose floor plus that
    the guaranteed self-match (sim=1.0 -> always same bucket) holds."""
    from ocgis_ray.stages.ann import ann_bruteforce, ann_lsh

    bf = ann_bruteforce(emb, queries, k=10).to_pandas()
    lsh = ann_lsh(emb, queries, k=10, nbits=6, ntables=16).to_pandas()
    recalls = []
    for q in queries["query_id"]:
        truth = set(bf[bf["query_id"] == q]["vec_id"])
        got = set(lsh[lsh["query_id"] == q]["vec_id"])
        recalls.append(len(truth & got) / len(truth))
        assert int(q) in got  # self always collides
    assert np.mean(recalls) >= 0.4, recalls


def test_embedding_near_dup_symmetric(emb):
    from ocgis_ray.stages.ann import embedding_near_duplicates

    pairs = embedding_near_duplicates(emb, threshold=0.4).to_pandas()
    # pairs are canonical (a < b) and unique
    assert (pairs["vec_a"] < pairs["vec_b"]).all()
    assert not pairs.duplicated(["vec_a", "vec_b"]).any()


def test_ivf_recall_and_exact_sims(emb, queries):
    """IVF coarse-quantizer path: bounded-sample k-means training,
    per-centroid probe lists, exact sims in-pass.  With nprobe == nlist
    every centroid is probed -> IVF degenerates to exact brute force;
    with a partial probe list recall stays high while pruning."""
    from ocgis_ray.stages.ann import ann_bruteforce, ann_ivf

    bf = ann_bruteforce(emb, queries, k=10).to_pandas()
    # full probe: must equal brute force exactly (same tie-break sort)
    full = ann_ivf(emb, queries, k=10, nlist=8, nprobe=8).to_pandas()
    for q in queries["query_id"]:
        want = bf[bf["query_id"] == q].sort_values("rank")["vec_id"].tolist()
        got = full[full["query_id"] == q].sort_values("rank")["vec_id"].tolist()
        assert got == want
    # partial probe: prune but keep recall
    ivf = ann_ivf(emb, queries, k=10, nlist=16, nprobe=8).to_pandas()
    recalls = []
    for q in queries["query_id"]:
        truth = set(bf[bf["query_id"] == q]["vec_id"])
        got = set(ivf[ivf["query_id"] == q]["vec_id"])
        recalls.append(len(truth & got) / len(truth))
    assert np.mean(recalls) >= 0.5, recalls
    # sims reported are the exact cosine (spot check one row)
    row = ivf.iloc[0]
    pdf = emb.to_pandas()
    from ocgis_ray.stages.ann import _normalize
    mat = _normalize(np.stack(pdf["embedding"].to_numpy()).astype(np.float64))
    ids = pdf["vec_id"].to_numpy()
    qrow = queries[queries["query_id"] == row["query_id"]].iloc[0]
    qv = _normalize(np.asarray(qrow["embedding"], float)[None, :])[0]
    assert row["sim"] == pytest.approx(
        float(mat[ids == row["vec_id"]][0] @ qv), abs=1e-12)


def test_pq_exact_when_codebook_holds_every_point(ray_session):
    """PQ correctness floor: with m=1 and ksub >= n the k-means
    codebook converges to the data points themselves, so ADC == exact
    cosine and ann_pq must equal brute force (same tie-break sort)."""
    import pandas as pd
    import ray.data as rd

    from ocgis_ray.stages.ann import ann_bruteforce, ann_pq

    rng = np.random.default_rng(4)
    n, dim = 120, 16
    mat = rng.normal(size=(n, dim))
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                        "embedding": list(mat.astype(np.float32))})
    ds = rd.from_pandas(pdf).materialize()
    queries = pdf.iloc[:3].rename(columns={"vec_id": "query_id"})
    bf = ann_bruteforce(ds, queries, k=5).to_pandas()
    pq = ann_pq(ds, queries, k=5, m=1, ksub=n, train_n=n).to_pandas()
    for q in queries["query_id"]:
        want = bf[bf["query_id"] == q].sort_values("rank")["vec_id"].tolist()
        got = pq[pq["query_id"] == q].sort_values("sim", ascending=False)[
            "vec_id"].tolist()
        assert got == want


def test_pq_recall_and_refine(emb, queries):
    """Real PQ compression (m=8 bytes/vector on the 64-dim fixture):
    ADC recall holds a floor, exact re-rank (refine) only improves it,
    and re-ranked sims are true cosines."""
    from ocgis_ray.stages.ann import _normalize, ann_bruteforce, ann_pq

    bf = ann_bruteforce(emb, queries, k=10).to_pandas()
    pq = ann_pq(emb, queries, k=10, m=8, ksub=64).to_pandas()
    ref = ann_pq(emb, queries, k=10, m=8, ksub=64, refine=4).to_pandas()

    def recall(out):
        rs = []
        for q in queries["query_id"]:
            truth = set(bf[bf["query_id"] == q]["vec_id"])
            rs.append(len(truth & set(out[out["query_id"] == q]["vec_id"]))
                      / len(truth))
        return float(np.mean(rs))

    r_adc, r_ref = recall(pq), recall(ref)
    assert r_adc >= 0.4, r_adc
    assert r_ref >= r_adc - 1e-9, (r_adc, r_ref)
    # self-match survives refine and carries an exact sim of 1.0
    top = ref.sort_values("sim", ascending=False).groupby("query_id").head(1)
    for _, row in top.iterrows():
        assert row["sim"] == pytest.approx(1.0, abs=1e-9)


def test_pq_codes_are_m_bytes(emb):
    """The encoded index is m bytes per vector (the 100-TB memory
    story: 8 bytes vs the 256-byte raw float32 embedding)."""
    from ocgis_ray.stages.ann import pq_encode, pq_train

    cb = pq_train(emb, m=8, ksub=16)
    codes = pq_encode(emb, cb).to_pandas()
    assert len(codes) == emb.count()
    assert {len(c) for c in codes["pq_code"]} == {8}


def test_hnsw_saturated_equals_bruteforce(emb, queries):
    """With M >= n and ef >= n the layer-0 graph is complete, the beam
    visits every node, and HNSW must equal brute force exactly
    (including the vec_id tie-break ranks)."""
    from ocgis_ray.stages.ann import ann_bruteforce, ann_hnsw

    n = emb.count()
    bf = ann_bruteforce(emb, queries, k=10).to_pandas()
    hn = ann_hnsw(emb, queries, k=10, M=n, ef_construction=n,
                  ef_search=n).to_pandas()
    cols = ["query_id", "rank", "vec_id"]
    a = bf.sort_values(["query_id", "rank"])[cols].reset_index(drop=True)
    b = hn.sort_values(["query_id", "rank"])[cols].reset_index(drop=True)
    assert a.equals(b)


def test_hnsw_recall_single_and_multi_shard(emb, queries):
    """Default params on the 500-vector fixture: recall@10 stays high
    on one shard (pure graph recall) and on 4 shards (graph recall per
    shard + exact merge); self is always top-1 since the query vector
    lives in some shard and greedy+beam reach it."""
    from ocgis_ray.stages.ann import ann_bruteforce, ann_hnsw

    bf = ann_bruteforce(emb, queries, k=10).to_pandas()

    def recall(out):
        rs = []
        for q in queries["query_id"]:
            truth = set(bf[bf["query_id"] == q]["vec_id"])
            rs.append(len(truth & set(out[out["query_id"] == q]["vec_id"]))
                      / len(truth))
        return float(np.mean(rs))

    one = ann_hnsw(emb, queries, k=10).to_pandas()
    assert recall(one) >= 0.8, recall(one)
    four = ann_hnsw(emb, queries, k=10, batch_size=128).to_pandas()
    assert recall(four) >= 0.8, recall(four)
    top1 = four[four["rank"] == 1].set_index("query_id")["vec_id"]
    for q in queries["query_id"]:
        assert top1[q] == q


def test_hnsw_build_is_deterministic():
    """Same shard -> identical graph (resume-stable per-shard index)."""
    from ocgis_ray.stages.ann import _normalize, hnsw_build, hnsw_search

    rng = np.random.default_rng(3)
    m = _normalize(rng.normal(size=(300, 16)))
    g1 = hnsw_build(m, M=8, ef_construction=32)
    g2 = hnsw_build(m, M=8, ef_construction=32)
    assert g1["entry"] == g2["entry"] and g1["top"] == g2["top"]
    for a, b in zip(g1["adj"], g2["adj"]):
        assert np.array_equal(a, b)
    nodes, sims = hnsw_search(m, g1, m[7], k=5)
    assert nodes[0] == 7 and sims[0] == pytest.approx(1.0, abs=1e-9)


def test_ivf_hnsw_saturated_equals_bruteforce(emb, queries):
    """Full probe list + saturated graph params: every cell is probed
    and every cell graph is complete, so the composition must equal
    brute force exactly."""
    from ocgis_ray.stages.ann import ann_bruteforce, ann_ivf_hnsw

    n = emb.count()
    bf = ann_bruteforce(emb, queries, k=10).to_pandas()
    iv = ann_ivf_hnsw(emb, queries, k=10, nlist=8, nprobe=8, M=n,
                      ef_construction=n, ef_search=n).to_pandas()
    cols = ["query_id", "rank", "vec_id"]
    a = bf.sort_values(["query_id", "rank"])[cols].reset_index(drop=True)
    b = iv.sort_values(["query_id", "rank"])[cols].reset_index(drop=True)
    assert a.equals(b)


def test_ivf_hnsw_partial_probe_recall(emb, queries):
    """Partial probe list + default graph params keeps useful recall
    while pruning both the scan (IVF) and the in-cell search (graph)."""
    from ocgis_ray.stages.ann import ann_bruteforce, ann_ivf_hnsw

    bf = ann_bruteforce(emb, queries, k=10).to_pandas()
    iv = ann_ivf_hnsw(emb, queries, k=10, nlist=16, nprobe=8).to_pandas()
    rs = []
    for q in queries["query_id"]:
        truth = set(bf[bf["query_id"] == q]["vec_id"])
        rs.append(len(truth & set(iv[iv["query_id"] == q]["vec_id"]))
                  / len(truth))
    assert float(np.mean(rs)) >= 0.5, rs
    top1 = iv[iv["rank"] == 1].set_index("query_id")["vec_id"]
    for q in queries["query_id"]:
        assert top1[q] == q  # self lives in a probed cell by construction


def test_hnsw_persisted_index_roundtrip(emb, queries, tmp_path):
    """Build-once/search-many: the persisted index searched with
    saturated params equals brute force exactly (float32 vector
    round-trip is re-normalized; sims are recomputed from the stored
    vectors so ranks are deterministic), and two searches of the same
    index are identical (resume-stable)."""
    from ocgis_ray.stages.ann import (ann_bruteforce, hnsw_index_search,
                                      hnsw_index_write)

    n = emb.count()
    path = str(tmp_path / "hnsw_idx")
    hnsw_index_write(emb, path, M=n, ef_construction=n)
    out1 = hnsw_index_search(path, queries, k=10, ef_search=n).to_pandas()
    out2 = hnsw_index_search(path, queries, k=10, ef_search=n).to_pandas()
    cols = ["query_id", "rank", "vec_id"]

    def canon(df):
        return df.sort_values(["query_id", "rank"])[cols].reset_index(drop=True)

    assert canon(out1).equals(canon(out2))
    bf = canon(ann_bruteforce(emb, queries, k=10).to_pandas())
    assert canon(out1)[["query_id", "vec_id"]].equals(bf[["query_id", "vec_id"]])


def test_hnsw_persisted_index_default_params(emb, queries, tmp_path):
    """Default (approximate) params through the persisted path keep
    recall, including multi-shard indexes."""
    from ocgis_ray.stages.ann import (ann_bruteforce, hnsw_index_search,
                                      hnsw_index_write)

    bf = ann_bruteforce(emb, queries, k=10).to_pandas()
    path = str(tmp_path / "hnsw_idx_multi")
    hnsw_index_write(emb, path, batch_size=128)
    out = hnsw_index_search(path, queries, k=10).to_pandas()
    rs = []
    for q in queries["query_id"]:
        truth = set(bf[bf["query_id"] == q]["vec_id"])
        rs.append(len(truth & set(out[out["query_id"] == q]["vec_id"]))
                  / len(truth))
    assert float(np.mean(rs)) >= 0.8, rs


def test_hnsw_index_incremental_append(emb, queries, tmp_path):
    """Crawl-over-crawl ingest: a second run_id appends new shards,
    searches see old+new, and re-running a completed run_id
    short-circuits (idempotent resume)."""
    from ocgis_ray.stages.ann import (ann_bruteforce, hnsw_index_search,
                                      hnsw_index_write)

    n = emb.count()
    path = str(tmp_path / "hnsw_inc")
    old = emb.filter(expr="vec_id < 250")
    new = emb.filter(expr="vec_id >= 250")
    hnsw_index_write(old, path, M=n, ef_construction=n, run_id="run0")
    part1 = hnsw_index_search(path, queries, k=10, ef_search=n).to_pandas()
    assert part1["vec_id"].max() < 250  # only the first crawl is indexed
    rec = hnsw_index_write(new, path, M=n, ef_construction=n, run_id="run1")
    assert not rec.get("skipped")
    again = hnsw_index_write(new, path, M=n, ef_construction=n, run_id="run1")
    assert again.get("skipped")
    full = hnsw_index_search(path, queries, k=10, ef_search=n).to_pandas()
    bf = ann_bruteforce(emb, queries, k=10).to_pandas()
    cols = ["query_id", "rank", "vec_id"]

    def canon(df):
        return df.sort_values(["query_id", "rank"])[cols].reset_index(drop=True)

    assert canon(full).equals(canon(bf))


class TestAnnIvfJoin:
    def _sides(self, n_left=60, n_right=2000, dim=16, seed=4):
        import ray.data as rd

        rng = np.random.RandomState(seed)
        # clustered vectors so IVF routing is meaningful
        centers = rng.normal(0, 1, (8, dim))
        def mk(n, id_name):
            pick = rng.randint(0, 8, n)
            m = centers[pick] + rng.normal(0, 0.15, (n, dim))
            return pd.DataFrame({
                id_name: np.arange(n, dtype=np.int64),
                "embedding": list(m.astype(np.float64))})
        left = mk(n_left, "query_id")
        right = mk(n_right, "vec_id")
        return (rd.from_pandas(left).repartition(3),
                rd.from_pandas(right).repartition(4), left, right)

    def _brute(self, left, right, k):
        def norm(m):
            return m / np.linalg.norm(m, axis=1, keepdims=True)
        lm = norm(np.stack(left["embedding"].to_numpy()))
        rm = norm(np.stack(right["embedding"].to_numpy()))
        sims = lm @ rm.T
        out = {}
        for i in range(lm.shape[0]):
            order = np.lexsort((right["vec_id"].to_numpy(), -sims[i]))[:k]
            out[int(left["query_id"].iloc[i])] = list(
                right["vec_id"].to_numpy()[order])
        return out

    def test_exhaustive_probe_equals_bruteforce(self, ray_session):
        from ocgis_ray.stages.ann import ann_ivf_join

        lds, rds, left, right = self._sides()
        got = ann_ivf_join(lds, rds, k=5, nlist=8, nprobe=8,
                           train_n=2000).to_pandas()
        want = self._brute(left, right, 5)
        for qid, grp in got.sort_values(["query_id", "rank"]) \
                .groupby("query_id", sort=True):
            assert list(grp["vec_id"]) == want[int(qid)]

    def test_partial_probe_recall(self, ray_session):
        from ocgis_ray.stages.ann import ann_ivf_join

        lds, rds, left, right = self._sides()
        got = ann_ivf_join(lds, rds, k=5, nlist=8, nprobe=3,
                           train_n=2000).to_pandas()
        want = self._brute(left, right, 5)
        hits = total = 0
        for qid, grp in got.groupby("query_id"):
            hits += len(set(grp["vec_id"]) & set(want[int(qid)]))
            total += 5
        assert hits / total >= 0.9  # tight clusters: probe recall high


def test_ann_ivf_join_hot_centroid_salting(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.ann import ann_ivf_join

    rng = np.random.RandomState(8)
    dim, n = 16, 3000
    # 90% of vectors in ONE tight cluster -> its centroid salts
    hot = rng.normal(0, 1, dim)
    m = np.where(rng.rand(n)[:, None] < 0.9,
                 hot[None, :] + rng.normal(0, 0.05, (n, dim)),
                 rng.normal(0, 1, (n, dim)))
    right = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                          "embedding": list(m)})
    left = pd.DataFrame({"query_id": np.arange(40, dtype=np.int64),
                         "embedding": list(m[:40] + 1e-4)})
    got = ann_ivf_join(rd.from_pandas(left).repartition(2),
                       rd.from_pandas(right).repartition(3),
                       k=4, nlist=4, nprobe=4, train_n=n).to_pandas()

    def norm(x):
        return x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = norm(np.stack(left["embedding"].to_numpy())) @ \
        norm(np.stack(right["embedding"].to_numpy())).T
    for qid, grp in got.sort_values(["query_id", "rank"]) \
            .groupby("query_id", sort=True):
        order = np.lexsort((right["vec_id"].to_numpy(),
                            -sims[int(qid)]))[:4]
        assert list(grp["vec_id"]) == list(right["vec_id"].to_numpy()[order])
