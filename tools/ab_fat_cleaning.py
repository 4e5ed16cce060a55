"""A/B: shuffle-cascade vs decide-on-slim cleaning at FAT rows.

Round-3 negative result (BASELINE.md): at ~700 B/row the composable
filters-before-shuffles cascade beats the decision-on-slim variant —
the extra read outweighs the saved shuffle bytes.  The round-3 verdict
asked for the re-test at real crawl row sizes (>=10 KB), where the two
fat keep-first shuffles dominate.  This tool materializes a fat
DUPLICATED corpus (each document repeated ``reps``x verbatim at
``body_reps``x body size, urls duplicated per (doc, rep-parity) so
BOTH dedup stages do real work), then interleaves timed runs of:

- A: ``clean_corpus(steps=(url_dedup, exact_dedup, pii))`` — fat rows
  cross two bucketed keep-first shuffles;
- B: ``clean_corpus_twopass`` — slim (id, hash) decision shuffles +
  broadcast/semi-join re-attach; fat rows never shuffle.

Prints one JSON line per corpus with wall times and the winner.

Usage: python tools/ab_fat_cleaning.py [sf_dir] [reps] [body_reps]
Env: RAY_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np


def materialize_fat_dup(sf_dir: str, reps: int, body_reps: int,
                        out_dir: str) -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    final = os.path.join(out_dir, f"fatdup_r{reps}_b{body_reps}")
    if os.path.exists(os.path.join(final, "_SUCCESS")):
        return final
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).sort_by("doc_id")
    ref = ray.put(docs)
    n = docs.num_rows

    def build(batch: pa.Table) -> pa.Table:
        d = ray.get(ref)
        ids = batch["id"].to_numpy(zero_copy_only=False)
        doc = ids // reps
        rep = ids % reps
        text0 = d["text"].take(pa.array(doc))
        body = text0
        for _ in range(body_reps - 1):
            body = pc.binary_join_element_wise(body, " ", text0, "")
        doc_s = pc.cast(pa.array(doc), pa.string())
        par_s = pc.cast(pa.array(rep % 2), pa.string())
        url = pc.binary_join_element_wise(
            "https://h", pc.cast(pa.array(doc % 1000), pa.string()),
            ".example.com/d/", doc_s, "/", par_s, "")
        return pa.table({"page_id": pa.array(ids),
                         "url": url, "text": body})

    ds = rd.range(n * reps, override_num_blocks=256)
    ds = ds.map_batches(build, batch_format="pyarrow", zero_copy_batch=True)
    tmp = final + "_tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ds.write_parquet(tmp)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    with open(os.path.join(final, "_SUCCESS"), "w") as f:
        f.write("")
    return final


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    body_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, ".")
    from ocgis_ray.pipelines.cleaning import clean_corpus, clean_corpus_twopass
    from ocgis_ray.sources.io import read_parquet_sized
    from ocgis_ray.tuning import tune_data_context

    tune_data_context()

    steps = ("url_dedup", "exact_dedup", "pii")

    def run_a() -> int:
        pages = read_parquet_sized(path, columns=["page_id", "url", "text"])
        return clean_corpus(pages, id_col="page_id", url_col="url",
                            steps=steps).count()

    def run_b() -> int:
        pages = read_parquet_sized(path, columns=["page_id", "url", "text"])
        return clean_corpus_twopass(
            pages, id_col="page_id", url_col="url", steps=steps,
            source=lambda cols: read_parquet_sized(path, columns=cols),
        ).count()

    for br in (body_reps, 1):
        path = materialize_fat_dup(sf_dir, reps, br, "/tmp/graft_ab")
        import duckdb

        meta = duckdb.sql(
            f"SELECT count(*) n, avg(length(text)) b "
            f"FROM '{path}/*.parquet'").fetchone()
        rows, avg_b = int(meta[0]), float(meta[1])
        # untimed warmups, then interleaved timed runs
        ca, cb = run_a(), run_b()
        assert ca == cb, f"survivor mismatch: {ca} vs {cb}"
        walls = {"shuffle_cascade": [], "twopass_slim": []}
        for _ in range(2):
            t0 = time.perf_counter()
            run_a()
            walls["shuffle_cascade"].append(round(time.perf_counter() - t0, 2))
            t0 = time.perf_counter()
            run_b()
            walls["twopass_slim"].append(round(time.perf_counter() - t0, 2))
        a, b = min(walls["shuffle_cascade"]), min(walls["twopass_slim"])
        print(json.dumps({
            "corpus": path, "rows": rows, "avg_text_bytes": round(avg_b),
            "survivors": ca, "walls": walls,
            "winner": "twopass_slim" if b < a else "shuffle_cascade",
            "speedup": round(a / b, 2), "load1": os.getloadavg()[0],
        }))
    ray.shutdown()


if __name__ == "__main__":
    main()
