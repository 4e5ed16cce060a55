"""Link-graph centrality — distributed PageRank over an edge Dataset.

Common-Crawl-derived pipelines weight documents by host-graph
centrality (the crawl frontier itself is rank-ordered; quality
classifiers use harmonic/PageRank features).  This is also the one
workload shape nothing else in the repo exercises: an ITERATIVE
fixed-point over bucketed joins (label propagation in
``stages/dedup.py`` is the boolean cousin).

Dataflow per iteration (all Dataset ops, nothing driver-sized):

1. ``contrib = edges ⋈ ranks ON src`` — the sized hash-shuffle join
   (``io.join_datasets``); each edge emits ``rank(src) / out_deg(src)``.
2. ``msum = contrib GROUP BY dst SUM`` — bucketed combine.
3. ``ranks' = nodes LEFT ⋈ msum``: ``(1 - d)/N + d * coalesce(msum, 0)``,
   materialized per iteration (node-sized, bounded by distinct hosts —
   the per-iteration checkpoint every distributed PageRank keeps).

The edges-with-degree table is static across iterations and is
materialized ONCE to the object store.

Semantics: the simplified no-dangling-redistribution variant — mass
flowing into nodes without out-edges leaves the system (rank sums to
< 1 when dangling nodes exist).  Callers who need the stochastic fix
add self-loops; the synthetic host graphs here are dangling-free.
Determinism: exact up to float summation order inside the per-dst
sums; round the FINAL ranks when comparing engines.

Reference seam: iterative solvers live outside the reference's scope;
the analog surface is the calc registry applied over a derived table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pagerank(edges, damping: float = 0.85, iters: int = 10,
             src: str = "src", dst: str = "dst",
             num_partitions: int | None = None,
             num_buckets: int | None = None,
             mode: str = "auto", broadcast_nodes: int = 1 << 17,
             broadcast_edges: int = 1 << 22):
    """(src, dst) edge Dataset -> (node, rank) Dataset.

    ``iters`` fixed iterations (no convergence test — the unrolled-SQL
    twin needs a deterministic count; callers watch the delta via two
    calls if they care).

    ``mode``: ``"shuffle"`` = the per-iteration bucketed-join dataflow
    (any graph size); ``"broadcast"`` = collect the edge list once and
    iterate driver-side (host graphs are typically 10^5-10^7 nodes —
    model-sized next to the page corpus, and each shuffle join costs
    ~1 s of FIXED aggregator-actor spawn, so 3 iterations of joins on
    a small graph is pure overhead); ``"auto"`` picks broadcast only
    when BOTH the node count <= ``broadcast_nodes`` AND the edge count
    <= ``broadcast_edges`` (a dense small-node graph can still carry
    driver-crushing edges).  Both paths compute the same fixed point
    (float summation order differs ~1e-15)."""
    from ocgis_ray.sources.io import (bucketed_group_apply, distinct_rows,
                                      join_datasets)

    if mode not in ("auto", "shuffle", "broadcast"):
        raise ValueError(f"unknown pagerank mode {mode!r}")
    d = float(damping)

    def _broadcast():
        import ray.data as rd

        pdf = edges.select_columns([src, dst]).to_pandas()
        if pdf.empty:
            raise ValueError("pagerank: empty edge set")
        ranks = pagerank_local(pdf, damping=d, iters=iters, src=src,
                               dst=dst)
        return rd.from_pandas(pd.DataFrame(
            {"node": ranks.index.to_numpy(object),
             "rank": ranks.to_numpy(np.float64)}))

    if mode == "broadcast":
        # explicit broadcast skips the distinct-node shuffle entirely
        # (its only product — the node universe — is recomputed
        # locally from the collected frame)
        return _broadcast()

    if mode == "auto":
        # auto must look at the edges up to three times (distinct
        # nodes, edge count, possible broadcast collect) — pin the
        # edge blocks ONCE so those are block reads / metadata counts,
        # not three executions of the upstream lineage (round-3
        # advice).  The shuffle path reuses the same blocks for its
        # degree pass and joins.
        edges = edges.materialize()

    # node universe = distinct(src) UNION distinct(dst)
    def proj(col, name):
        return edges.select_columns([col]).map_batches(
            lambda t, c=col, n=name: pa.table({n: t[c]}),
            batch_format="pyarrow", zero_copy_batch=True)

    nodes = distinct_rows(proj(src, "node").union(proj(dst, "node")),
                          "node").materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge set")
    if (mode == "auto" and n_nodes <= broadcast_nodes
            and edges.count() <= broadcast_edges):
        return _broadcast()
    base = (1.0 - d) / n_nodes
    init = 1.0 / n_nodes

    def count_deg(g: pa.Table) -> pa.Table:
        out = g.group_by([src], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({src: out[src],
                         "_deg": out["count_all"].cast(pa.int64())})

    deg = bucketed_group_apply(
        edges.map_batches(lambda t: pa.table({src: t[src]}),
                          batch_format="pyarrow", zero_copy_batch=True),
        src, count_deg, num_buckets=num_buckets, batch_format="pyarrow")
    # static across iterations -> one object-store checkpoint
    edges_deg = join_datasets(edges, deg, on=[src],
                              num_partitions=num_partitions).materialize()

    ranks = nodes.map_batches(
        lambda t: t.append_column("rank", pa.array(
            np.full(t.num_rows, init))),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    def sum_dst(g: pa.Table) -> pa.Table:
        out = g.group_by([dst], use_threads=False).aggregate([("_m", "sum")])
        return pa.table({dst: out[dst], "_m": out["_m_sum"]})

    for _ in range(iters):
        contrib = join_datasets(edges_deg, ranks, on=[src], right_on=["node"],
                                num_partitions=num_partitions)
        contrib = contrib.map_batches(
            lambda t: pa.table({
                dst: t[dst],
                "_m": pa.array(t["rank"].to_numpy(zero_copy_only=False)
                               / t["_deg"].to_numpy(zero_copy_only=False)),
            }),
            batch_format="pyarrow", zero_copy_batch=True)
        msum = bucketed_group_apply(contrib, dst, sum_dst,
                                    num_buckets=num_buckets,
                                    batch_format="pyarrow")
        joined = join_datasets(nodes, msum, on=["node"], right_on=[dst],
                               join_type="left_outer",
                               num_partitions=num_partitions)

        def upd(t: pa.Table) -> pa.Table:
            m = t["_m"].to_numpy(zero_copy_only=False).astype(np.float64)
            m = np.nan_to_num(m, nan=0.0)
            return pa.table({"node": t["node"],
                             "rank": pa.array(base + d * m)})

        ranks = joined.map_batches(upd, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
    return ranks


def pagerank_sql_ctes(edges_cte: str, nodes_cte: str, iters: int = 3,
                      damping: float = 0.85, prefix: str = "pr") -> tuple[str, str]:
    """DuckDB twin of :func:`pagerank` as a chain of CTE fragments —
    the fixed iteration count unrolls into ``iters`` nested LEFT
    JOINs, mirroring the engine's operation order exactly (same
    ``(1-d)/n + d*sum(rank/deg)`` expression; summation order differs,
    so round final ranks on both sides).

    Requires ``{edges_cte}(src, dst)`` and ``{nodes_cte}(node)`` CTEs
    in scope; returns ``(ctes_sql, final_cte_name)`` where the final
    CTE has columns ``(node, rank)``."""
    d = repr(float(damping))
    p = prefix
    parts = [
        f"{p}cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM {nodes_cte})",
        (f"{p}deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg "
         f"FROM {edges_cte} GROUP BY src)"),
        (f"{p}r0 AS (SELECT node, 1.0 / c.n AS rank "
         f"FROM {nodes_cte} CROSS JOIN {p}cnt c)"),
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"{p}r{t} AS (\n"
            f"  SELECT v.node, (1.0 - {d}) / c.n"
            f" + {d} * coalesce(m.msum, 0.0) AS rank\n"
            f"  FROM {nodes_cte} v CROSS JOIN {p}cnt c\n"
            f"  LEFT JOIN (SELECT e.dst AS node,"
            f" sum(r.rank / g.deg) AS msum\n"
            f"             FROM {edges_cte} e"
            f" JOIN {p}r{t - 1} r ON e.src = r.node\n"
            f"             JOIN {p}deg g ON e.src = g.src"
            f" GROUP BY e.dst) m\n"
            f"  ON v.node = m.node)")
    return ",\n".join(parts), f"{p}r{iters}"


def pagerank_local(edges_df: pd.DataFrame, damping: float = 0.85,
                   iters: int = 10, src: str = "src",
                   dst: str = "dst") -> pd.Series:
    """Dense local reference (tests): same simplified semantics."""
    nodes = sorted(set(edges_df[src]) | set(edges_df[dst]))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = edges_df.groupby(src).size()
    r = np.full(n, 1.0 / n)
    si = edges_df[src].map(idx).to_numpy()
    di = edges_df[dst].map(idx).to_numpy()
    w = 1.0 / deg.loc[edges_df[src]].to_numpy(np.float64)
    for _ in range(iters):
        m = np.zeros(n)
        np.add.at(m, di, r[si] * w)
        r = (1.0 - damping) / n + damping * m
    return pd.Series(r, index=nodes)
