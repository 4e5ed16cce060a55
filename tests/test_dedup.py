"""Dedup: exact, minhash estimate accuracy, simhash, jaccard."""

import numpy as np
import pandas as pd
import pytest

from ocgis_ray.stages.dedup import (
    MinHashStage,
    SimHashStage,
    _hamming64,
    dedup_exact,
    dedup_survivors,
    minhash_near_duplicates,
    ngram_jaccard,
    simhash_near_duplicates,
    simhash_signatures,
)

BASE = "the quick brown fox jumps over the lazy dog again and again with words " * 3
NEAR = BASE.replace("lazy", "sleepy")
FAR = "completely different content about database engines and shuffles " * 4


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [BASE, BASE, NEAR, FAR, FAR, "tiny"],
    })
    return rd.from_pandas(df), df


def test_dedup_exact(docs_ds):
    ds, df = docs_ds
    out = dedup_exact(ds).to_pandas().sort_values("doc_id")
    # doc 1 (dup of 0) and doc 4 (dup of 3) dropped
    assert out["doc_id"].tolist() == [0, 2, 3, 5]


def test_ngram_jaccard_bounds():
    assert ngram_jaccard(BASE, BASE) == 1.0
    j_near = ngram_jaccard(BASE, NEAR)
    assert 0.3 < j_near < 1.0
    assert ngram_jaccard(BASE, FAR) < 0.05


def test_minhash_estimates_jaccard():
    st = MinHashStage(num_perm=256)
    sa, sb = st.signature(BASE), st.signature(NEAR)
    est = float(np.mean(sa == sb))
    exact = ngram_jaccard(BASE, NEAR)
    assert est == pytest.approx(exact, abs=0.15)
    sc = st.signature(FAR)
    assert float(np.mean(sa == sc)) < 0.1


def test_minhash_pipeline_finds_near_dups(docs_ds):
    ds, df = docs_ds
    pairs = minhash_near_duplicates(ds, threshold=0.4).to_pandas()
    found = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert (0, 1) in found  # exact dup
    assert (3, 4) in found
    assert (0, 2) in found or (1, 2) in found  # near dup
    assert not any({a, b} == {0, 3} for a, b in found)


def test_dedup_survivors(docs_ds):
    ds, df = docs_ds
    pairs = pd.DataFrame({"doc_a": [0, 3], "doc_b": [1, 4]})
    out = dedup_survivors(ds, pairs).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 2, 3, 5]


def test_hamming64():
    a = np.array([0b1010, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    b = np.array([0b0010, 0x0], dtype=np.uint64)
    assert _hamming64(a, b).tolist() == [1, 64]


def test_simhash_identical_and_near(docs_ds):
    ds, df = docs_ds
    sigs = simhash_signatures(ds).to_pandas().set_index("doc_id")["simhash"]
    assert sigs[0] == sigs[1]  # identical docs
    ham_near = _hamming64(
        np.array([sigs[0]], dtype=np.int64).astype(np.uint64),
        np.array([sigs[2]], dtype=np.int64).astype(np.uint64),
    )[0]
    ham_far = _hamming64(
        np.array([sigs[0]], dtype=np.int64).astype(np.uint64),
        np.array([sigs[3]], dtype=np.int64).astype(np.uint64),
    )[0]
    assert ham_near < ham_far


def test_simhash_pairs_pipeline(docs_ds):
    ds, df = docs_ds
    pairs = simhash_near_duplicates(simhash_signatures(ds), max_hamming=3).to_pandas()
    found = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert (0, 1) in found
    assert (3, 4) in found


def test_simhash_pigeonhole_wide_hamming(ray_session):
    """max_hamming=6 pairs whose differing bits span >4 of the old
    16-bit bands must still be found (bands = max_hamming + 1 now)."""
    import pandas as pd
    import ray.data as rd

    from ocgis_ray.stages.dedup import simhash_near_duplicates

    base = np.uint64(0x0123456789ABCDEF)
    # flip 6 bits spread across six different 16-bit quadrants'
    # positions: 0, 12, 24, 36, 48, 60
    flips = np.uint64(0)
    for b in (0, 12, 24, 36, 48, 60):
        flips |= np.uint64(1) << np.uint64(b)
    other = base ^ flips
    df = pd.DataFrame({"doc_id": np.array([1, 2], dtype=np.int64),
                       "simhash": np.array([base, other]).astype(np.int64)})
    out = simhash_near_duplicates(rd.from_pandas(df),
                                  max_hamming=6).to_pandas()
    assert len(out) == 1 and int(out["hamming"].iloc[0]) == 6


def test_minhash_empty_batch_and_band_params(ray_session, sf_dir):
    """zero-row batches flow through the signature stage; an explicit
    bands= argument is honored (rows derived from num_perm)."""
    import ray.data as rd

    from ocgis_ray.stages.dedup import minhash_signatures

    empty = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"]).filter(lambda r: False)
    assert minhash_signatures(empty).count() == 0


def test_simhash_vectorized_matches_naive(ray_session):
    """The batch-wide 64-bincount simhash equals a per-doc
    reimplementation using the same tokenizer + Horner hash."""
    import pyarrow as pa

    from ocgis_ray.stages.dedup import SimHashStage
    from ocgis_ray.stages.text import _horner_hash_bytes

    texts = ["the quick brown fox", "the quick brown fox",
             "lorem ipsum dolor sit amet", "", "a b a b c",
             "tabs\tand\nnewlines mixed   spaces"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    got = SimHashStage()(pa.Table.from_pandas(df))["simhash"] \
        .to_numpy().astype(np.uint64)
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            assert got[i] == 0
            continue
        h = np.asarray([_horner_hash_bytes(w.encode()) for w in toks],
                       dtype=np.uint64)
        sig = np.uint64(0)
        for b in range(64):
            votes = int((((h >> np.uint64(b)) & np.uint64(1)).sum()))
            if votes * 2 > len(toks):
                sig |= np.uint64(1) << np.uint64(b)
        assert got[i] == sig, i


# ------------------------------------------------ connected components

def _local_components(edges):
    """Reference union-find on the driver."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_connected_components_random_graph(ray_session):
    import pandas as pd
    import ray.data as rd
    from ocgis_ray.stages.dedup import connected_components

    rng = np.random.RandomState(7)
    edges = [(int(a), int(b)) for a, b in rng.randint(0, 60, (80, 2))
             if a != b]
    pairs = rd.from_pandas(pd.DataFrame(edges, columns=["doc_a", "doc_b"]))
    got = connected_components(pairs, num_buckets=4).to_pandas()
    want = _local_components(edges)
    assert dict(zip(got["id"], got["component"])) == want


def test_connected_components_chain_and_empty(ray_session):
    import pandas as pd
    import ray.data as rd
    from ocgis_ray.stages.dedup import connected_components

    # worst-case diameter: a 12-node chain — min label must walk the
    # whole chain (one hop per round)
    chain = [(i, i + 1) for i in range(11)]
    pairs = rd.from_pandas(pd.DataFrame(chain, columns=["doc_a", "doc_b"]))
    got = connected_components(pairs, num_buckets=4).to_pandas()
    assert set(got["component"]) == {0} and len(got) == 12

    empty = rd.from_pandas(pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                         "doc_b": pd.Series([], dtype=np.int64)}))
    assert connected_components(empty, num_buckets=4).count() == 0


def test_cluster_vs_greedy_survivors(ray_session):
    """pairs (1,3),(3,2): greedy drops only 3 (the max of each pair)
    and keeps 1 AND 2; transitive clustering sees {1,2,3} as one
    cluster and keeps only 1 — the documented semantic difference."""
    import pandas as pd
    import ray.data as rd
    from ocgis_ray.stages.dedup import dedup_cluster_survivors, dedup_survivors

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(1, 5, dtype=np.int64),
        "text": ["a", "b", "c", "d"]}))
    pairs = rd.from_pandas(pd.DataFrame({
        "doc_a": np.array([1, 3], np.int64),
        "doc_b": np.array([3, 2], np.int64)}))
    cluster = set(dedup_cluster_survivors(docs, pairs, num_buckets=4)
                  .to_pandas()["doc_id"])
    greedy = set(dedup_survivors(docs, pairs).to_pandas()["doc_id"])
    assert cluster == {1, 4}
    assert greedy == {1, 2, 4}


def test_connected_components_raises_on_round_exhaustion(ray_session):
    import pandas as pd
    import ray.data as rd
    from ocgis_ray.stages.dedup import connected_components

    chain = [(i, i + 1) for i in range(11)]
    pairs = rd.from_pandas(pd.DataFrame(chain, columns=["doc_a", "doc_b"]))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_rounds=3, num_buckets=4)


def test_cluster_survivors_on_minhash_pairs(ray_session, sf_dir):
    """end-to-end: minhash near-dup pairs -> components -> one doc per
    cluster; survivors + losers partition the corpus."""
    from ocgis_ray.sources.io import read_parquet_sized
    from ocgis_ray.stages.dedup import (connected_components,
                                        dedup_cluster_survivors,
                                        minhash_near_duplicates)

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])
    pairs = minhash_near_duplicates(docs, threshold=0.5).materialize()
    n_docs = docs.count()
    surv = dedup_cluster_survivors(docs, pairs, num_buckets=4).to_pandas()
    comp = connected_components(pairs, num_buckets=4).to_pandas()
    in_pairs = set(comp["id"])
    # every component's min id survives; every other member is dropped
    mins = set(comp["component"])
    dropped = in_pairs - mins
    got = set(surv["doc_id"])
    assert mins <= got and not (dropped & got)
    assert len(surv) == n_docs - len(dropped)


def test_minhash_dedup_incremental(ray_session, tmp_path):
    """Crawl-over-crawl dedup against a persisted signature store:
    run 1 dedups within its own batch and seeds the store; run 2 drops
    new docs matching STORED survivors (old never loses); a re-run of
    a completed run_id short-circuits idempotently via the manifest."""
    import ray.data as rd

    from ocgis_ray.stages.dedup import minhash_dedup_incremental

    store = str(tmp_path / "sigstore")
    # NEAR edits 3 tokens of BASE (est ~0.59, unluckily zero aligned
    # 4-row bands in the fixed 32x4 banding) -- use an append-only
    # near-dup (est ~0.77, 8 colliding bands) for the LSH-recall legs
    near2 = BASE + "one extra trailing sentence"
    batch1 = pd.DataFrame({
        "doc_id": np.array([0, 1, 2], dtype=np.int64),
        "text": [BASE, near2, FAR],  # 0~1 near-dups, 2 distinct
    })
    surv1, rec1 = minhash_dedup_incremental(
        rd.from_pandas(batch1), store, threshold=0.5, run_id="r1")
    ids1 = sorted(surv1.to_pandas()["doc_id"])
    assert ids1 == [0, 2]            # 1 lost to smaller-id 0
    assert rec1["status"] == "complete" and rec1["rows"] == 2

    batch2 = pd.DataFrame({
        "doc_id": np.array([10, 11], dtype=np.int64),
        "text": [near2, "fresh unseen content entirely new tokens " * 4],
    })
    surv2, rec2 = minhash_dedup_incremental(
        rd.from_pandas(batch2), store, threshold=0.5, run_id="r2")
    ids2 = sorted(surv2.to_pandas()["doc_id"])
    assert ids2 == [11]              # 10 lost to STORED doc 0
    assert rec2["rows"] == 1

    # idempotent resume: same run_id -> stored partition, same answer
    surv2b, rec2b = minhash_dedup_incremental(
        rd.from_pandas(batch2), store, threshold=0.5, run_id="r2")
    assert sorted(surv2b.to_pandas()["doc_id"]) == [11]
    assert rec2b["status"] == "resumed"

    # the store now holds exactly the three survivor signatures
    import glob

    stored = rd.read_parquet(
        sorted(glob.glob(f"{store}/part=*/*.parquet"))).to_pandas()
    assert sorted(stored["doc_id"]) == [0, 2, 11]


def test_cluster_survivors_quality_aware(ray_session):
    """quality_col picks the cluster's best-quality doc (not min id);
    ties break to min id; NaN quality never wins; prefer="min" flips
    the objective (perplexity-style); random graph checked against a
    local union-find + argmax reference."""
    import pandas as pd
    import ray.data as rd
    from ocgis_ray.stages.dedup import dedup_cluster_survivors

    # hand case: cluster {1,2,3} where 3 has the best quality
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(1, 5, dtype=np.int64),
        "q": np.array([0.1, 0.5, 0.9, 0.2]),
        "text": ["a", "b", "c", "d"]}))
    pairs = rd.from_pandas(pd.DataFrame({
        "doc_a": np.array([1, 3], np.int64),
        "doc_b": np.array([3, 2], np.int64)}))
    got = set(dedup_cluster_survivors(docs, pairs, quality_col="q",
                                      num_buckets=4).to_pandas()["doc_id"])
    assert got == {3, 4}
    low = set(dedup_cluster_survivors(docs, pairs, quality_col="q",
                                      prefer="min", num_buckets=4)
              .to_pandas()["doc_id"])
    assert low == {1, 4}
    with pytest.raises(ValueError, match="prefer"):
        dedup_cluster_survivors(docs, pairs, quality_col="q", prefer="best")

    # ties -> min id; NaN never beats a number
    docs2 = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(1, 5, dtype=np.int64),
        "q": np.array([0.5, 0.5, np.nan, np.nan])}))
    pairs2 = rd.from_pandas(pd.DataFrame({
        "doc_a": np.array([1, 3], np.int64),
        "doc_b": np.array([2, 4], np.int64)}))
    got2 = set(dedup_cluster_survivors(docs2, pairs2, quality_col="q",
                                       num_buckets=4).to_pandas()["doc_id"])
    assert got2 == {1, 3}

    # random graph vs local reference
    rng = np.random.RandomState(11)
    edges = [(int(a), int(b)) for a, b in rng.randint(0, 40, (50, 2))
             if a != b]
    qual = rng.rand(40)
    docs3 = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64), "q": qual}))
    pairs3 = rd.from_pandas(pd.DataFrame(edges, columns=["doc_a", "doc_b"]))
    comp = _local_components(edges)
    clusters = {}
    for node, root in comp.items():
        clusters.setdefault(root, []).append(node)
    want = set(range(40)) - set(comp)  # untouched docs survive
    for members in clusters.values():
        want.add(min(members, key=lambda i: (-qual[i], i)))
    got3 = set(dedup_cluster_survivors(docs3, pairs3, quality_col="q",
                                       num_buckets=4).to_pandas()["doc_id"])
    assert got3 == want
