"""End-to-end web-corpus cleaning pipeline.

Composes the training-data operators into the published-pipeline order
(C4 / Gopher / RefinedWeb; see stages/quality.py for the rule
citations):

1. URL-level exact dedup          (first pass every crawl pipeline runs)
2. C4 line cleaning               (terminal punct / min words / blocklist)
3. Gopher quality gate            (repetition + stop-word signals)
4. benchmark decontamination      (n-token-gram overlap vs a broadcast
                                   eval-set index — row-local, so it
                                   runs with the filters, not after
                                   the shuffles as some pipelines do)
5. exact content dedup            (hash-bucketed keep-first)
6. paragraph-level exact dedup    (cross-document, global keep-first)
7. MinHash near-dup survivors     (LSH candidates -> estimated Jaccard
                                   -> connected components -> keep the
                                   min-id doc per cluster)
8. PII redaction                  (Arrow RE2 kernel scrub)

Filters run BEFORE the dedup shuffles (the RefinedWeb order): the
quality kernels then read zero-copy Arrow blocks straight off storage,
and every all-to-all exchange carries only the surviving rows.  PII
runs LAST so the regex pass touches nothing that later stages would
drop.

Every stage is a streaming Ray Data transform — the pipeline is lazy
until consumed, nothing materializes on the driver, and each shuffle
is hash-bucketed (see the per-stage modules for the 100-TB arguments).
Steps are individually skippable: real corpora differ (the synthetic
``documents`` table has no newlines, so ``c4`` would gate everything
on terminal punctuation — callers choose).  Step application order is
the canonical order above, independent of the tuple's order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_STEPS = ("url_dedup", "c4", "gopher", "decontam", "exact_dedup",
                 "paragraph_dedup", "near_dup", "pii")
# recognized but not default:
# - substr_dedup: ExactSubstr-style span cutting, the expensive
#   alternative/complement to paragraph_dedup (3 shuffles)
# - compression: zlib-ratio repetitiveness gate (Dolma/RPv2 signal)
# - kn_ppl: KN-bigram perplexity gate (CCNet head/middle; needs
#   kn_model) — runs with the filters, right after gopher
# - classifier: NB quality-classifier gate (phi-style; needs nb_model)
# - normalize: Unicode normalization (NFC + control strip + ws
#   collapse, stages/normalize.py) — runs FIRST so every downstream
#   hash/gate sees canonical text; not default because it rewrites
#   text (byte-identity contracts opt in explicitly)
# - url_filter: broadcast blocklist gate (UT1-style domain lists +
#   RE2 path patterns, stages/url.py) — runs right after url_dedup,
#   before any per-byte work; needs url_col + a non-empty blocklist
# - wordlist: C4 document-level bad-word gate (whole-word RE2,
#   quality.wordlist_doc_filter) — runs right before c4's line rules;
#   needs a non-empty blocked_words tuple
ALL_STEPS = DEFAULT_STEPS + ("substr_dedup", "compression", "kn_ppl",
                             "classifier", "normalize", "url_filter",
                             "wordlist")


def clean_corpus(ds, id_col: str = "doc_id", text_col: str = "text",
                 url_col: str | None = None,
                 steps: tuple[str, ...] = DEFAULT_STEPS,
                 minhash_threshold: float = 0.7,
                 near_dup_method: str = "minhash",
                 max_hamming: int = 3,
                 embeddings=None, embedding_threshold: float = 0.95,
                 bench_ngrams=None, decontam_n: int = 13,
                 substr_min_len: int = 64,
                 kn_model=None, kn_max_ppl: float = 1e4,
                 nb_model=None, nb_keep_label: str = "keep",
                 nb_min_margin: float = 0.0,
                 compression_min: float = 0.30,
                 compression_max: float = 1.15,
                 blocked_domains: tuple[str, ...] = (),
                 blocked_patterns: tuple[str, ...] = (),
                 blocked_words: tuple[str, ...] = (),
                 num_buckets: int | None = None):
    """Run the cleaning cascade over a documents Dataset; returns the
    surviving documents (same schema, text possibly rewritten by the
    pii/c4/paragraph steps).  ``url_dedup`` is skipped automatically
    when ``url_col`` is None.  ``near_dup_method`` picks the candidate
    generator: ``"minhash"`` (Jaccard-style, ``minhash_threshold``),
    ``"simhash"`` (Hamming-style, ``max_hamming`` bits), or
    ``"embedding"`` (cosine >= ``embedding_threshold`` over the
    ``embeddings`` Dataset — (vec_id, embedding) rows whose vec_id is
    the document id; semantic near-dups that token hashing misses).
    ``decontam`` drops docs sharing any ``decontam_n``-token window
    with ``bench_ngrams`` (a ``decontam.build_bench_ngrams`` index);
    it is skipped automatically when ``bench_ngrams`` is None (the
    default steps include it so callers who pass an eval index get the
    gate without re-ordering anything).  Opt-in model gates (same
    auto-skip convention): ``"compression"`` (zlib-ratio band
    ``compression_min..compression_max``), ``"kn_ppl"`` (KN-bigram
    perplexity <= ``kn_max_ppl`` under ``kn_model``), ``"classifier"``
    (NB ``nb_model`` predicts ``nb_keep_label`` with margin >=
    ``nb_min_margin``) — all run with the filters, before the dedup
    shuffles."""
    if near_dup_method not in ("minhash", "simhash", "embedding"):
        raise ValueError(f"unknown near_dup_method {near_dup_method!r}")
    if near_dup_method == "embedding" and embeddings is None \
            and "near_dup" in steps:
        raise ValueError("near_dup_method='embedding' needs an "
                         "embeddings Dataset (vec_id, embedding)")
    unknown = set(steps) - set(ALL_STEPS)
    if unknown:
        raise ValueError(f"unknown cleaning steps: {sorted(unknown)}")
    # Model-gated steps auto-skip ONLY under the default step list
    # (decontam's docstring rationale: defaults include it so callers
    # who pass an eval index get the gate for free).  A caller who
    # EXPLICITLY lists a model-gated step without its model gets an
    # error, not a silent no-op filter.
    if steps is not DEFAULT_STEPS:
        for step, model, arg in (("kn_ppl", kn_model, "kn_model"),
                                 ("classifier", nb_model, "nb_model"),
                                 ("decontam", bench_ngrams, "bench_ngrams")):
            if step in steps and model is None:
                raise ValueError(
                    f"cleaning step {step!r} was explicitly requested "
                    f"but {arg} is None — it would silently filter "
                    f"nothing; pass the model or drop the step")
        if "url_filter" in steps:
            if url_col is None:
                raise ValueError("cleaning step 'url_filter' needs "
                                 "url_col")
            if not blocked_domains and not blocked_patterns:
                raise ValueError(
                    "cleaning step 'url_filter' was explicitly "
                    "requested but both blocked_domains and "
                    "blocked_patterns are empty — it would silently "
                    "filter nothing; pass a blocklist or drop the step")
        if "wordlist" in steps and not blocked_words:
            raise ValueError(
                "cleaning step 'wordlist' was explicitly requested "
                "but blocked_words is empty — it would silently "
                "filter nothing; pass the word list or drop the step")

    from ocgis_ray.stages import dedup, quality
    from ocgis_ray.stages.url import dedup_by_url

    if "normalize" in steps:
        from ocgis_ray.stages.normalize import normalize_text

        ds = normalize_text(ds, col=text_col)
    if "url_dedup" in steps and url_col is not None:
        ds = dedup_by_url(ds, col=url_col, id_col=id_col)
    if "url_filter" in steps and url_col is not None \
            and (blocked_domains or blocked_patterns):
        from ocgis_ray.stages.url import url_filter

        ds = url_filter(ds, blocked_domains=blocked_domains,
                        blocked_patterns=blocked_patterns, col=url_col)
    if "wordlist" in steps and blocked_words:
        ds = quality.wordlist_doc_filter(ds, blocked_words, col=text_col)
    if "c4" in steps:
        ds = quality.c4_line_filter(ds, col=text_col)
    if "gopher" in steps:
        ds = quality.gopher_filter(ds, col=text_col)
    if "compression" in steps:
        ds = quality.compression_filter(ds, col=text_col,
                                        min_ratio=compression_min,
                                        max_ratio=compression_max)
    # model gates run with the filters (CCNet puts the LM gate before
    # dedup); auto-skip when no model is supplied, like decontam
    if "kn_ppl" in steps and kn_model is not None:
        from ocgis_ray.stages.kn import kn_perplexity_filter

        ds = kn_perplexity_filter(ds, kn_model, max_ppl=kn_max_ppl,
                                  col=text_col)
    if "classifier" in steps and nb_model is not None:
        from ocgis_ray.stages.classifier import classifier_filter

        ds = classifier_filter(ds, nb_model, keep_label=nb_keep_label,
                               min_margin=nb_min_margin, col=text_col)
    if "decontam" in steps and bench_ngrams is not None:
        from ocgis_ray.stages.decontam import decontaminate

        ds = decontaminate(ds, bench_ngrams, n=decontam_n, col=text_col)
    if "exact_dedup" in steps:
        ds = dedup.dedup_exact(ds, id_col=id_col, col=text_col)
    if "paragraph_dedup" in steps:
        # paragraph projection drops the other columns; re-attach them
        # afterwards via the id hash join would cost a shuffle — at
        # this point in the cascade only (id, text) matter downstream,
        # so the pipeline narrows to them (document the contract)
        ds = quality.paragraph_dedup(ds, id_col=id_col, col=text_col,
                                     num_buckets=num_buckets)
    if "substr_dedup" in steps:
        from ocgis_ray.stages.substr import substring_dedup

        ds = substring_dedup(ds, min_len=substr_min_len, id_col=id_col,
                             col=text_col, num_buckets=num_buckets)
    if "near_dup" in steps:
        # the minhash stage hardcodes (doc_id, text) column names —
        # project+rename for custom schemas so the advertised
        # id_col/text_col generality holds for every step
        nd_in = ds
        if (id_col, text_col) != ("doc_id", "text"):
            def _std_names(t):
                import pyarrow as pa

                return pa.table({"doc_id": t[id_col], "text": t[text_col]})

            nd_in = ds.map_batches(_std_names, batch_format="pyarrow",
                                   zero_copy_batch=True)
        if near_dup_method == "simhash":
            pairs = dedup.simhash_near_duplicates(
                dedup.simhash_signatures(nd_in), max_hamming=max_hamming)
        elif near_dup_method == "embedding":
            from ocgis_ray.stages.ann import embedding_near_duplicates

            raw = embedding_near_duplicates(
                embeddings, threshold=embedding_threshold,
                num_partitions=num_buckets)
            pairs = raw.map_batches(
                lambda t: t.rename_columns(
                    ["doc_a" if c == "vec_a" else
                     "doc_b" if c == "vec_b" else c
                     for c in t.column_names]),
                batch_format="pyarrow", zero_copy_batch=True)
        else:
            pairs = dedup.minhash_near_duplicates(
                nd_in, threshold=minhash_threshold,
                num_partitions=num_buckets)
        ds = dedup.dedup_cluster_survivors(ds, pairs, id_col=id_col,
                                           num_partitions=num_buckets)
    if "pii" in steps:
        ds = quality.pii_redact(ds, col=text_col)
    return ds


DEFAULT_FILTER_STEPS = ("c4", "gopher", "decontam", "pii")
DEFAULT_DEDUP_STEPS = ("url_dedup", "exact_dedup", "near_dup")


def clean_corpus_partitioned(in_dir: str, out_dir: str,
                             id_col: str = "doc_id", text_col: str = "text",
                             url_col: str | None = None,
                             n_partitions: int = 8, resume: bool = True,
                             filter_steps: tuple[str, ...] = DEFAULT_FILTER_STEPS,
                             dedup_steps: tuple[str, ...] = DEFAULT_DEDUP_STEPS,
                             minhash_threshold: float = 0.7,
                             bench_ngrams=None, decontam_n: int = 13,
                             dedup_method: str = "shuffle"):
    """Resumable two-phase cleaning job (the ``ray job submit`` shape):

    - **Phase A (per partition, resumable)**: the row-local steps
      (c4/gopher/decontam/pii — pure maps given the broadcast
      benchmark index, safe to run shard-at-a-time) over
      ``id_col``-range partitions of the input, each written atomically
      with a lineage record; a re-submitted job skips completed
      partitions without reading their input (parquet range pushdown).
    - **Phase B (global, idempotent)**: the CROSS-PARTITION steps
      (URL/exact/near dedup — partition-local dedup would miss
      duplicates straddling shards) over phase A's checkpoint, written
      as the ``final`` output directory in one atomic rename.

    ``dedup_method="twopass"`` runs phase B's url/exact dedup through
    the decide-on-slim path (:func:`clean_corpus_twopass`, the fat-row
    shape): decisions shuffle slim (id, hash) projections over
    column-pruned reads of the phase-A checkpoint, and the wide rows
    re-attach by broadcast/semi-join; near-dup (if listed) follows on
    the survivors via the cascade.

    Returns the manifest records written this run."""
    if dedup_method not in ("shuffle", "twopass"):
        raise ValueError(f"unknown dedup_method {dedup_method!r}")
    import pyarrow.compute as pc

    from ocgis_ray.sources.io import read_parquet_sized
    from ocgis_ray.state import lineage

    # the default filter tuple gets decontam's auto-skip, like
    # clean_corpus's DEFAULT_STEPS; an explicit tuple naming decontam
    # without an index raises inside clean_corpus
    if filter_steps is DEFAULT_FILTER_STEPS and bench_ngrams is None:
        filter_steps = tuple(s for s in filter_steps if s != "decontam")
    bad = (set(filter_steps) | set(dedup_steps)) - set(ALL_STEPS)
    if bad:
        raise ValueError(f"unknown cleaning steps: {sorted(bad)}")

    # id range via one cheap id-column pass (per-block min/max, tiny
    # driver reduce) — partition bounds must be derived, not assumed
    agg = read_parquet_sized(in_dir, columns=[id_col]) \
        .map_batches(lambda t: {"lo": [int(pc.min(t[id_col]).as_py())],
                                "hi": [int(pc.max(t[id_col]).as_py())]},
                     batch_format="pyarrow").to_pandas()
    lo, hi = int(agg["lo"].min()), int(agg["hi"].max())
    step = max(1, (hi - lo + 1 + n_partitions - 1) // n_partitions)

    cols = [id_col, text_col] + ([url_col] if url_col else [])

    def make_ds(part: str):
        p = int(part)
        plo, phi = lo + p * step, lo + (p + 1) * step
        # the id range pushes down as a parquet scan filter: row-group
        # statistics prune non-overlapping groups at the FOOTER, so N
        # partitions cost ~one total input scan — the round-2 shape
        # (read-everything + map_batches filter) re-scanned the full
        # input once PER partition (256 full reads at 100 TB)
        import pyarrow.dataset as pads

        ds = read_parquet_sized(
            in_dir, columns=cols,
            filter=(pads.field(id_col) >= plo) & (pads.field(id_col) < phi))
        return clean_corpus(ds, id_col=id_col, text_col=text_col,
                            url_col=url_col, steps=filter_steps,
                            bench_ngrams=bench_ngrams,
                            decontam_n=decontam_n)

    phase_a = f"{out_dir}/filtered"
    records = lineage.run_partitioned(
        make_ds, phase_a, [str(i) for i in range(n_partitions)],
        resume=resume)

    if resume and "final" in lineage.completed_partitions(out_dir):
        return records
    import glob
    import os

    files = sorted(glob.glob(os.path.join(phase_a, "**", "*.parquet"),
                             recursive=True))
    if not files:
        # phase A filtered away every row: read_parquet([]) raises an
        # opaque error inside Ray — fail with the actual cause instead
        raise ValueError(
            f"clean_corpus_partitioned: phase A ({phase_a}) produced no "
            f"rows — every document was filtered by {filter_steps}; no "
            "'final' partition written")
    filtered = read_parquet_sized(files, columns=cols)
    if dedup_method == "twopass":
        tp_steps = tuple(s_ for s_ in dedup_steps
                         if s_ in ("url_dedup", "exact_dedup"))
        if "exact_dedup" not in tp_steps:
            raise ValueError("dedup_method='twopass' needs exact_dedup "
                             "in dedup_steps")
        final = clean_corpus_twopass(
            filtered, id_col=id_col, text_col=text_col, url_col=url_col,
            steps=tp_steps,
            source=lambda c: read_parquet_sized(
                files, columns=[x for x in c if x in cols]))
        rest = tuple(s_ for s_ in dedup_steps if s_ not in tp_steps)
        if rest:
            final = clean_corpus(final, id_col=id_col, text_col=text_col,
                                 url_col=url_col, steps=rest,
                                 minhash_threshold=minhash_threshold)
    else:
        final = clean_corpus(filtered, id_col=id_col, text_col=text_col,
                             url_col=url_col, steps=dedup_steps,
                             minhash_threshold=minhash_threshold)
    records.append(lineage.write_partition(final, out_dir, "final"))
    return records


# row-local gate steps whose verdicts can be decided in a slim pass
# (they never rewrite text); c4 REWRITES text and pii rewrites last
_GATE_STEPS = ("gopher", "compression", "kn_ppl", "classifier", "decontam")


def semi_join_ids(ds, ids, id_col: str, broadcast_max: int = 1 << 25,
                  num_buckets: int | None = None):
    """Keep rows of ``ds`` whose ``id_col`` appears in the (unique-id)
    Dataset ``ids`` — the re-attach step of decide-on-slim cleaning.

    Two shapes, auto-selected by survivor count:

    - **broadcast** (ids <= ``broadcast_max``, default 32M ~ 256 MB):
      the sorted id vector ships once via ``ray.put``; each batch
      filters by ``np.searchsorted`` — NO shuffle of ``ds``, the only
      cost is the lookup.  This is the fat-row win: the wide rows
      never leave their read tasks.
    - **bucketed semi-join** (bigger survivor sets): one hash-shuffle
      join on the id — still exactly ONE fat exchange, vs one per
      dedup stage in the shuffle cascade.
    """
    import ray

    from ocgis_ray.sources.io import join_datasets

    ids = ids.materialize()
    n = ids.count()
    if n <= broadcast_max:
        vec = np.sort(ids.to_pandas()[id_col].to_numpy(np.int64))
        ref = ray.put(vec)

        def keep(t: pa.Table) -> pa.Table:
            v = ray.get(ref)
            x = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(v, x)
            pos[pos == len(v)] = 0
            return t.filter(pa.array(v[pos] == x))

        return ds.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)
    return join_datasets(ds, ids, on=[id_col], num_partitions=num_buckets)


def clean_corpus_twopass(ds, id_col: str = "doc_id", text_col: str = "text",
                         url_col: str | None = None,
                         steps: tuple[str, ...] = ("url_dedup", "gopher",
                                                   "exact_dedup", "pii"),
                         num_buckets: int | None = None,
                         broadcast_max: int = 1 << 25,
                         bench_ngrams=None, decontam_n: int = 13,
                         kn_model=None, kn_max_ppl: float = 1e4,
                         nb_model=None, nb_keep_label: str = "keep",
                         nb_min_margin: float = 0.0,
                         compression_min: float = 0.30,
                         compression_max: float = 1.15,
                         source=None):
    """Decide-on-slim variant of :func:`clean_corpus` for FAT rows
    (real crawl text, ~10-100 KB/row): identical survivor set and
    output text, but the wide text column never crosses a dedup
    shuffle.

    Shape (vs the composable cascade, which shuffles fat rows once per
    dedup stage):

    1. **URL decision** — slim ``(id, url-key)`` keep-first shuffle
       (8-16 B/row) over the RAW input, preserving the canonical
       url-dedup-before-filters order;
    2. **gate + content decision** — re-run of the row-local steps
       (c4 rewrite + gates) projected to ``(id, text-hash)``, url
       survivors only, then a slim keep-first on the hash;
    3. **re-attach** — :func:`semi_join_ids` (broadcast or one
       bucketed semi-join) filters the full rows, re-applies the c4
       rewrite, and runs pii last.

    The input lineage executes up to three times (Ray re-executes the
    Dataset per consumption) — the trade is extra READS for zero fat
    SHUFFLES, which wins when rows are wide (shuffle bytes ~ 1000x the
    slim projection) and loses at narrow synthetic rows (~700 B, see
    BASELINE.md round-3 negative result).  Callers pass a Dataset
    whose upstream is cheap to re-execute (a parquet read); an
    expensive upstream should be materialized first.

    Steps supported: url_dedup, c4, the row-local gates
    (gopher/compression/kn_ppl/classifier/decontam), exact_dedup, pii.
    Global rewrites (paragraph/substr/near-dup) follow downstream on
    the (already slim-ified) survivor output via :func:`clean_corpus`.

    ``source``: optional ``source(columns) -> Dataset`` factory (e.g.
    ``lambda cols: read_parquet_sized(path, columns=cols)``).  When
    given, the decision passes read ONLY the columns they need — the
    URL pass never decodes the fat text column at all (projection
    cannot be pushed back through an already-built Dataset's
    map_batches lineage, so pruning must happen at the read).
    """
    from ocgis_ray.sources.io import distinct_rows
    from ocgis_ray.stages.text import string_value_hash

    supported = {"url_dedup", "c4", "exact_dedup", "pii", *_GATE_STEPS}
    unknown = set(steps) - supported
    if unknown:
        raise ValueError(
            f"clean_corpus_twopass does not support steps {sorted(unknown)}; "
            "run them downstream via clean_corpus")
    if "exact_dedup" not in steps:
        raise ValueError("clean_corpus_twopass without exact_dedup has "
                         "nothing to decide slim — use clean_corpus")

    gates = tuple(s for s in steps if s in _GATE_STEPS)
    rewrite = ("c4",) if "c4" in steps else ()
    gate_kwargs = dict(bench_ngrams=bench_ngrams, decontam_n=decontam_n,
                       kn_model=kn_model, kn_max_ppl=kn_max_ppl,
                       nb_model=nb_model, nb_keep_label=nb_keep_label,
                       nb_min_margin=nb_min_margin,
                       compression_min=compression_min,
                       compression_max=compression_max)

    def src(columns):
        return source(columns) if source is not None else ds

    # 1. slim URL decision over the raw input (canonical order)
    url_surv = None
    if "url_dedup" in steps and url_col is not None:
        def url_slim(t: pa.Table) -> pa.Table:
            h = string_value_hash(t[url_col]).view(np.int64)
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            # null urls never dedup against each other: per-row key
            # outside the id space (urls hash the full 64-bit range,
            # but a collision only risks dropping one extra row —
            # same fidelity as the shipped 64-bit exact dedup)
            if t[url_col].null_count:
                isnull = pc.is_null(t[url_col]).to_numpy(
                    zero_copy_only=False)
                # per-row sentinel in the complemented-id domain
                h = np.where(isnull, ids ^ np.int64(-1), h)
            return pa.table({id_col: pa.array(ids), "_uk": pa.array(h)})

        slim0 = src([id_col, url_col]).map_batches(
            url_slim, batch_format="pyarrow", zero_copy_batch=True)
        url_surv = distinct_rows(slim0, "_uk", order_col=id_col,
                                 num_buckets=num_buckets) \
            .drop_columns(["_uk"])

    # 2. gate + content decision, URL survivors only — the filter
    # runs BEFORE the gates and the content hash, matching the
    # canonical url-dedup-first order AND its cost profile (on a
    # duplicated crawl the url pass shrinks the corpus before any
    # per-byte work; hashing every raw row measured 5x the whole
    # cascade).  c4's rewrite feeds the hash, so exact dedup sees
    # rewritten text exactly as in clean_corpus.
    src2 = src([id_col, text_col])
    if url_surv is not None:
        src2 = semi_join_ids(src2, url_surv, id_col,
                             broadcast_max=broadcast_max,
                             num_buckets=num_buckets)
    decided = clean_corpus(src2, id_col=id_col,
                           text_col=text_col, steps=rewrite + gates,
                           num_buckets=num_buckets, **gate_kwargs)

    def text_slim(t: pa.Table) -> pa.Table:
        h = string_value_hash(t[text_col]).view(np.int64)
        return pa.table({id_col: t[id_col], "_th": pa.array(h)})

    slim1 = decided.map_batches(text_slim, batch_format="pyarrow",
                                zero_copy_batch=True)
    surv = distinct_rows(slim1, "_th", order_col=id_col,
                         num_buckets=num_buckets).drop_columns(["_th"])

    # 3. re-attach: full rows, re-apply the rewrite, pii last
    out = clean_corpus(ds, id_col=id_col, text_col=text_col,
                       steps=rewrite, num_buckets=num_buckets) \
        if rewrite else ds
    out = semi_join_ids(out, surv, id_col, broadcast_max=broadcast_max,
                        num_buckets=num_buckets)
    if "pii" in steps:
        from ocgis_ray.stages import quality

        out = quality.pii_redact(out, col=text_col)
    return out
