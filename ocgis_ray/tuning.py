"""Ray Data context tuning shared by bench, tests and the driver entry.

``tune_data_context()`` is idempotent and safe to call after the
session owner's ``ray.init``  (it never initialises Ray itself).

Why each knob:

- ``op_resource_reservation_enabled = False``: the default
  ReservationOpResourceAllocator splits 50% of the CPU budget across
  ALL operators in the plan; with a 5-6 operator pipeline on a small
  session (8 cpus) that throttles the busy map operator to 1-2
  concurrent tasks (measured: 62s -> 15.8s on the 10M-page flagship at
  8 cpus).  On a big cluster the reservation is per-node-pool and far
  less binding, but the local-mode scaling protocol needs it off to
  measure actual operator cost.
- ``target_max_block_size = 32 MiB``: map tasks receive input BUNDLES
  of up to this size; at the default 128 MiB a 1.5 GB / 46-block input
  collapses to ~19 fat tasks and a 32-core node runs one ragged wave
  (measured: flagship 5.9s -> 2.9s at 32 cpus with 32 MiB).  This
  aligns bundle granularity with ``read_parquet_sized``'s 32 MiB read
  blocks; on a multi-node cluster the same alignment keeps every core
  fed without inflating shuffle metadata (blocks stay tens of MB).
- progress bars / verbose off: benchmark output hygiene (bench.py must
  print exactly one JSON line on stdout).
"""

from __future__ import annotations

import logging


def tune_data_context() -> None:
    import warnings

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False
    ctx.target_max_block_size = 32 * 1024 * 1024
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    # driver-side hint that fires whenever a fixed actor pool sits
    # behind a 1-block input — spurious at the small test scales (the
    # pool sizes are deliberate, auto_pool documents the measurements)
    # and it drowns real warnings in gate/bench logs
    warnings.filterwarnings(
        "ignore", message=".*minimum number of concurrent actors.*")


def auto_pool(n_max: int | None = None) -> int:
    """Fixed actor-pool size from the live cluster.

    Two measured failure modes this resolves: a FIXED pool of N >=
    session CPUs reserves every core and deadlocks the read (4-cpu
    sessions); an AUTOSCALING (1, N) pool ramps too slowly for short
    stages (signature scan 6.2s vs 1.5s fixed).  So: fixed size,
    cpus/4 capped at 8 by default (actor SPAWN cost dominates short
    stages — a 16-actor pool on a 2s scan spends more time forking
    workers than scanning), always leaving >= 2 CPUs for the
    read/shuffle stages.  Long heavy scans should pass an explicit
    larger ``concurrency``."""
    import ray

    total = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    cap = max(1, total - 2)
    want = n_max if n_max is not None else min(8, max(1, total // 4))
    return max(1, min(want, cap))


# Per-worker-process instance cache for task_stage (lives in each Ray
# worker process; bounded — distinct (class, broadcast-ref) keys per
# pipeline are few, but long sessions churn models, so evict FIFO).
_TASK_STAGE_CACHE: dict = {}
_TASK_STAGE_CACHE_MAX = 16


def task_stage(cls, **ctor_kwargs):
    """Wrap an actor-style stage class as a STATELESS ``map_batches``
    function with a per-worker-process instance cache.

    Why: a fixed-size actor pool (``concurrency=N``) must START all N
    actors before the stage runs.  Stacking K cheap scoring pools in
    one pipeline reserves K*N CPUs up front — at K*N >= session CPUs
    the read tasks starve and the pipeline DEADLOCKS (measured:
    langid_documents with four chained pools of 2 hung forever at 8
    cpus).  Broadcast-model scorers whose state is small (unigram LM,
    NB logp matrix, stopword tables) don't need reserved actors: as a
    task stage the streaming executor schedules them freely, and the
    instance (including the one ``ray.get`` of the broadcast ref) is
    built once per WORKER PROCESS via this module-level cache — same
    amortization as an actor pool, none of the capacity reservation.

    ``ctor_kwargs`` must be hashable; ``ray.ObjectRef`` values key by
    their hex so two models of the same class never share an instance.
    """

    def _key_val(v):
        import ray

        return ("ref", v.hex()) if isinstance(v, ray.ObjectRef) else v

    key = (cls.__module__, cls.__qualname__,
           tuple(sorted((k, _key_val(v)) for k, v in ctor_kwargs.items())))

    def fn(batch):
        inst = _TASK_STAGE_CACHE.get(key)
        if inst is None:
            while len(_TASK_STAGE_CACHE) >= _TASK_STAGE_CACHE_MAX:
                _TASK_STAGE_CACHE.pop(next(iter(_TASK_STAGE_CACHE)))
            inst = _TASK_STAGE_CACHE.setdefault(key, cls(**ctor_kwargs))
        return inst(batch)

    fn.__name__ = f"task_{cls.__name__}"
    return fn


def auto_buckets(n: int | None = None) -> int:
    """Default hash-bucket count for the bucketed-shuffle helpers
    (``io.bucketed_group_apply`` family): fixed 32.

    Bucket count must scale with the DATA (rows × row width), not the
    session's CPUs, and the two failure directions are asymmetric —
    measured on this host: too MANY buckets on tiny data costs a
    bounded ~0.3 s of task overhead (pair-attach over 7k pairs, warm:
    4 buckets 0.67 s vs 32 → 1.07 s), while too FEW buckets on big
    data costs 25–47%% of the whole pipeline (flagship rollup over 10M
    pages at 4 cpus, interleaved A/B: 4 buckets 250/197 s vs 32
    buckets 170/156 s — fat per-bucket combine frames stall the
    streaming pipeline behind the scan).  A cpus-derived default was
    tried and reverted on that A/B.  With no data-size signal at
    planning time the big-data-safe constant wins; warehouse-scale
    callers size buckets to rows × row_width / target_bucket_bytes and
    pass ``num_buckets`` explicitly (every helper takes it)."""
    if n is not None:
        if n < 1:
            raise ValueError(f"num_buckets must be >= 1, got {n}")
        return n
    return 32
