"""Crawl state tables: append-versioned parquet with a manifest (checkpoint).

Production design (SURVEY §2.1 S6, §4): frontier/seen/docs are Iceberg
tables — ``MERGE INTO … ON t.id = s.id`` gives idempotent upsert-by-url_hash
(the exact equivalent of the reference's ES ``_id = url_hash`` bulk upsert,
elasticsearch.rb:88), bucketed by ``bucket(N, url_hash)``. The sandbox has
no Iceberg runtime jar, so this module implements the same contract on
plain parquet with an explicit manifest:

* ``append(name, df)`` writes a new immutable snapshot directory per wave
  — valid because admission already guarantees key-newness (the anti-join
  runs before the write), so append ≡ MERGE-insert-only.
* ``docs`` upsert-by-id is resolved at read time by keeping the *latest*
  wave per id (re-crawl waves overwrite) — MERGE-update semantics.
* the JSON manifest carries wave number, admission seq watermark, row
  counts and per-wave metrics — the "per-partition checkpoints with
  lineage + metrics" resume contract from the north rule.

The executable migration map to the Iceberg layout — CREATE TABLE DDL
with ``bucket(N, url_hash)``, the per-wave ``MERGE INTO`` statement,
``rewrite_data_files``/``expire_snapshots`` calls, and the session confs
enabling storage-partitioned joins — lives in ``state/iceberg.py``;
``tests/test_iceberg_map.py`` proves the plan-shape claim (co-bucketed
seen anti-join runs with zero Exchange operators) using Spark's built-in
bucketed tables, which share the physical mechanism.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class StateStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- manifest ----------------------------------------------------------

    @property
    def manifest_path(self):
        return os.path.join(self.root, "manifest.json")

    def read_manifest(self) -> dict | None:
        try:
            with open(self.manifest_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def write_manifest(self, m: dict):
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, default=str)
        os.replace(tmp, self.manifest_path)

    # --- tables -------------------------------------------------------------

    def table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def append(self, name: str, df: DataFrame, wave: int) -> str:
        path = os.path.join(self.table_dir(name), f"wave={wave:05d}")
        df.write.mode("overwrite").parquet(path)
        return path

    def row_count(self, path: str) -> int:
        """Exact row count from parquet footers — a driver-local metadata
        read, no Spark job. The local stand-in for an Iceberg snapshot
        summary's ``total-records`` (which a production MERGE commit
        publishes for free)."""
        import glob

        import pyarrow.parquet as pq

        return sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(path, "*.parquet"))
        )

    def reset(self, name: str):
        """Drop a state table (re-crawl resets the per-run seen set while
        the docs/parsed history persists for the purge stage)."""
        import shutil

        d = self.table_dir(name)
        if os.path.isdir(d):
            shutil.rmtree(d)

    def exists(self, name: str) -> bool:
        d = self.table_dir(name)
        return os.path.isdir(d) and any(p.startswith("wave=") for p in os.listdir(d))

    def read(self, name: str) -> DataFrame | None:
        if not self.exists(name):
            return None
        return self.spark.read.option("basePath", self.table_dir(name)).parquet(
            os.path.join(self.table_dir(name), "wave=*")
        )

    def compact(self, name: str, df: DataFrame | None = None) -> str:
        """Bin-pack a state table's files — the plain-parquet stand-in for
        Iceberg ``rewrite_data_files`` + ``expire_snapshots``. A long crawl
        appends one snapshot dir per wave, each with one file per write
        task; at 10^10 URLs that is thousands of small files whose
        open/footer cost starts to dominate the seen anti-join scan.

        Reads the current table (or the caller's resolved view — pass a
        merge-on-read resolution to also fold update history into data
        files), rewrites it with ONE file per wave, and atomically swaps
        the table directory (Iceberg makes this swap a metadata commit;
        here it is two renames). Per-row ``wave`` values and the exact
        zero-padded snapshot dir names are preserved, so recrawl/purge
        staleness checks and manifest paths (``frontier_pending``) remain
        valid.
        """
        import shutil

        src = df if df is not None else self.read(name)
        if src is None:
            return self.table_dir(name)
        tmp = os.path.join(self.root, f".{name}.compacting")
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        # one shuffle partition per wave -> one bin-packed file per wave dir
        src.repartition("wave").write.partitionBy("wave").mode(
            "overwrite"
        ).parquet(tmp)
        # restore the append() dir-name convention (wave=00003, not wave=3)
        for d in os.listdir(tmp):
            if d.startswith("wave="):
                w = int(d.split("=", 1)[1])
                os.rename(os.path.join(tmp, d),
                          os.path.join(tmp, f"wave={w:05d}"))
        old = self.table_dir(name)
        prior_waves = {d for d in os.listdir(old) if d.startswith("wave=")}
        gone = os.path.join(self.root, f".{name}.old")
        os.rename(old, gone)
        os.rename(tmp, old)
        shutil.rmtree(gone)
        # a wave that admitted 0 rows writes no data files, so the rewrite
        # drops its dir — restore it empty: manifest paths (frontier_pending
        # often points at the final, empty wave) must survive compaction
        for d in sorted(prior_waves - set(os.listdir(old))):
            from pyspark.sql import functions as F

            src.filter(F.lit(False)).drop("wave").write.mode(
                "overwrite"
            ).parquet(os.path.join(old, d))
        return old

    def checkpoint(self, wave: int, seq_base: int, seen_count: int, extra: dict | None = None):
        m = self.read_manifest() or {"created_at": time.time(), "waves": []}
        m["wave"] = wave
        m["seq_base"] = seq_base
        m["seen_count"] = seen_count
        m["waves"].append({"wave": wave, "seq_base": seq_base, "seen_count": seen_count,
                           **(extra or {})})
        self.write_manifest(m)
