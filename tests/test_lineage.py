"""Lineage manifest + resume-from-checkpoint semantics."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from ocgis_ray.state import lineage


def make_ds_factory(tmp_path_str):
    import ray.data as rd

    calls = []

    def make_ds(part: str):
        calls.append(part)
        df = pd.DataFrame({
            "part": [part] * 10,
            "v": np.arange(10, dtype=np.int64) + int(part) * 100,
        })
        return rd.from_pandas(df)

    return make_ds, calls


def test_write_and_manifest(ray_session, tmp_path):
    out = str(tmp_path / "o1")
    make_ds, calls = make_ds_factory(out)
    recs = lineage.run_partitioned(make_ds, out, ["0", "1", "2"])
    assert len(recs) == 3
    assert sorted(os.listdir(out)) == ["manifest.jsonl", "part=0", "part=1", "part=2"]
    man = lineage.read_manifest(out)
    assert all(r["status"] == "complete" for r in man)
    assert all(r["rows"] == 10 for r in man)
    assert all(r["bytes"] > 0 for r in man)


def test_resume_skips_completed(ray_session, tmp_path):
    out = str(tmp_path / "o2")
    make_ds, calls = make_ds_factory(out)
    lineage.run_partitioned(make_ds, out, ["0", "1"])
    assert calls == ["0", "1"]
    # simulate adding new partitions; resume must not re-run 0/1
    recs = lineage.run_partitioned(make_ds, out, ["0", "1", "2", "3"])
    assert calls == ["0", "1", "2", "3"]
    assert [r["partition"] for r in recs] == ["2", "3"]


def test_crash_mid_partition_is_idempotent(ray_session, tmp_path):
    out = str(tmp_path / "o3")
    make_ds, calls = make_ds_factory(out)
    lineage.run_partitioned(make_ds, out, ["0"])
    # simulate a crash AFTER data write but BEFORE manifest append:
    # remove the manifest line; the rename target exists but is re-done
    os.remove(lineage.manifest_path(out))
    recs = lineage.run_partitioned(make_ds, out, ["0"])
    assert len(recs) == 1
    man = lineage.read_manifest(out)
    assert len(man) == 1

    # outputs identical across the redo
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(out, "part=0")).to_pandas().sort_values("v")
    assert t["v"].tolist() == list(range(10))


def test_outputs_identical_after_resume(ray_session, tmp_path):
    import pyarrow.parquet as pq

    out_a = str(tmp_path / "full")
    out_b = str(tmp_path / "resumed")
    make_a, _ = make_ds_factory(out_a)
    make_b, _ = make_ds_factory(out_b)
    lineage.run_partitioned(make_a, out_a, ["0", "1", "2"])
    # interrupted run: only partition 0 done, then resume all
    lineage.run_partitioned(make_b, out_b, ["0"])
    lineage.run_partitioned(make_b, out_b, ["0", "1", "2"])

    for p in ["0", "1", "2"]:
        ta = pq.read_table(os.path.join(out_a, f"part={p}")).to_pandas().sort_values("v")
        tb = pq.read_table(os.path.join(out_b, f"part={p}")).to_pandas().sort_values("v")
        assert ta["v"].tolist() == tb["v"].tolist()


def test_flagship_partitioned_resume(ray_session, sf_dir, tmp_path):
    from ocgis_ray.pipelines.flagship import flagship_partitioned

    out = str(tmp_path / "fp")
    recs1 = flagship_partitioned(sf_dir, out, n_partitions=4)
    assert len(recs1) == 4
    # rerun: everything complete -> no work
    recs2 = flagship_partitioned(sf_dir, out, n_partitions=4)
    assert recs2 == []
    # total joined rows across partitions == unpartitioned join count
    total = sum(r["rows"] for r in recs1)
    from ocgis_ray.sources.cabinet import layer
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.spatial_join import spatial_join

    ds = geocode(pages_dataset(sf_dir).drop_columns(["html"]))
    expect = spatial_join(ds, layer("world_regions"), how="inner", concurrency=2).count()
    assert total == expect


def test_empty_partition_completes(ray_session, tmp_path):
    """A partition with zero rows still commits + resumes as complete
    (the allow_empty analog for tiled output)."""
    import pandas as pd
    import ray.data as rd

    out = str(tmp_path / "empty")
    calls = []

    def make_ds(part):
        calls.append(part)
        return rd.from_pandas(pd.DataFrame({"a": pd.Series([], dtype="int64")}))

    recs = lineage.run_partitioned(make_ds, out, ["p0"])
    assert recs[0]["rows"] == 0
    recs2 = lineage.run_partitioned(make_ds, out, ["p0"])
    assert recs2 == [] and calls == ["p0"]


def test_chunked_rwg_weights_and_resume(ray_session, tmp_path):
    """chunked regrid-weight generation (ocli chunked-rwg analog,
    ocli.py:39-305 + grid_chunker.py write_chunks/merge): exact
    conservative fractions on the nested quadgrid, per-tile chunks
    with lineage resume."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import ray.data as rd

    from chunked_rwg import weights_for_tile
    from ocgis_ray.state import lineage

    w = weights_for_tile(0, src_res=7, dst_res=5, n_tiles_x=8)
    # every dst cell's child weights sum to exactly 1 (conservative)
    sums = w.groupby("dst")["w"].sum()
    assert (sums == 1.0).all()
    assert (w.groupby("dst").size() == 16).all()  # 4^(7-5)=16 children
    out = str(tmp_path / "rwg")
    lineage.write_partition(rd.from_pandas(w), out, "tile_000", meta={"tile": 0})
    assert lineage.completed_partitions(out) == {"tile_000"}


# ------------------------------------------------------------ compaction

class TestCompaction:
    def _write_fragmented(self, tmp_path, part="a", n_files=6, rows=300):
        import ray.data as rd

        out = str(tmp_path / "tbl")
        ds = rd.from_pandas(pd.DataFrame({
            "k": np.arange(rows, dtype=np.int64),
            "v": np.arange(rows, dtype=np.float64) * 0.5,
        })).repartition(n_files)
        lineage.write_partition(ds, out, part)
        return out

    def test_compacts_small_files_and_preserves_rows(self, ray_session,
                                                     tmp_path):
        out = self._write_fragmented(tmp_path)
        before = lineage.partition_files(out, "a")
        assert len(before) >= 2
        recs = lineage.compact_partitions(out, target_bytes=1 << 30)
        assert len(recs) == 1 and recs[0]["status"] == "compacted"
        after = lineage.partition_files(out, "a")
        assert len(after) < len(before)
        import pyarrow.parquet as pq

        t = pq.read_table(after, partitioning=None)
        assert t.num_rows == 300
        assert sorted(t["k"].to_pylist()) == list(range(300))
        # resume status unchanged: partition still counted complete
        assert lineage.completed_partitions(out) == {"a"}

    def test_idempotent_second_pass(self, ray_session, tmp_path):
        out = self._write_fragmented(tmp_path)
        assert len(lineage.compact_partitions(out, target_bytes=1 << 30)) == 1
        # second pass: already compact -> no rewrite
        assert lineage.compact_partitions(out, target_bytes=1 << 30) == []

    def test_large_files_left_alone(self, ray_session, tmp_path):
        out = self._write_fragmented(tmp_path, n_files=2)
        # tiny target: mean size is above target/2 -> not eligible
        assert lineage.compact_partitions(out, target_bytes=2) == []


class TestCompactionCrashRecovery:
    """Rename-aside swap: a crash anywhere leaves >=1 complete copy,
    and the orphan sweep at the next run repairs the directory."""

    def _fragmented(self, tmp_path):
        import ray.data as rd

        out = str(tmp_path / "tbl")
        ds = rd.from_pandas(pd.DataFrame({
            "k": np.arange(300, dtype=np.int64),
            "v": np.arange(300, dtype=np.float64) * 0.5,
        })).repartition(6)
        lineage.write_partition(ds, out, "a")
        return out

    def test_orphan_aside_with_missing_target_is_restored(
            self, ray_session, tmp_path):
        import os
        import shutil

        out = self._fragmented(tmp_path)
        final = os.path.join(out, "part=a")
        # simulate a crash between rename(final, aside) and
        # rename(tmp, final): only the aside copy exists
        os.rename(final, final + ".old")
        recs = lineage.compact_partitions(out, target_bytes=1 << 30)
        # sweep restored the partition, then compaction proceeded
        assert len(recs) == 1 and recs[0]["rows"] == 300
        assert os.path.isdir(final)
        assert not os.path.exists(final + ".old")
        import pyarrow.parquet as pq

        t = pq.read_table(lineage.partition_files(out, "a"),
                          partitioning=None)
        assert sorted(t["k"].to_pylist()) == list(range(300))
        shutil.rmtree(out)

    def test_orphan_aside_with_live_target_is_deleted(
            self, ray_session, tmp_path):
        import os

        out = self._fragmented(tmp_path)
        final = os.path.join(out, "part=a")
        # simulate a crash after rename(tmp, final) but before the
        # cleanup rmtree: both copies exist, final is authoritative
        import shutil as sh

        sh.copytree(final, final + ".old")
        lineage.compact_partitions(out, target_bytes=1 << 30)
        assert os.path.isdir(final)
        assert not os.path.exists(final + ".old")
        assert lineage.completed_partitions(out) == {"a"}


def test_write_partition_rejects_reserved_old_suffix(ray_session, tmp_path):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"k": [1]}))
    with pytest.raises(ValueError, match="'.old'"):
        lineage.write_partition(ds, str(tmp_path / "t"), "snap.old")
