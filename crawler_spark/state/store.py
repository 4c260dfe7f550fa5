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

import hashlib
import json
import os
import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# a bucketed data file carries its bucket id in the name
# (part-00000-<uuid>_00007.c000.snappy.parquet); anything else in a wave
# dir is a plain (pre-bucketing or empty-wave) file
_BUCKET_FILE_RE = re.compile(r"_\d{5}(?:\.c\d+)?\.[^/]*parquet$")

_SPEC_FILE = "_bucket_spec.json"

_OVERWRITE_MODE = "spark.sql.sources.partitionOverwriteMode"


class StateStore:
    """``bucketed_tables``: state tables stored as Spark bucketed tables
    (CLUSTERED BY ``bucket_key`` INTO N BUCKETS, partitioned by wave) —
    the plain-parquet stand-in for Iceberg ``bucket(N, url_hash)``
    (state/iceberg.py). The payoff is the per-wave seen anti-join: the
    bucketed scan reports ``outputPartitioning = hashpartitioning(key, N)``
    so the join plans with ZERO Exchange on the table side — only the
    wave-sized candidate delta shuffles, never the cumulative table
    (pinned by tests/test_bucketed_state_join.py). At 10^10 URLs this is
    the difference between re-shuffling the full seen set every wave and
    never moving it.

    The wave=NNNNN snapshot-dir contract is preserved exactly: inserts go
    through a ``PARTITIONED BY (wave STRING)`` table whose partition
    values are the zero-padded wave numbers, so resume/manifest paths,
    ``row_count`` footer reads, and direct per-wave dir reads all keep
    working. A pre-bucketing state dir (wave dirs, no ``_bucket_spec``
    sidecar) transparently stays on the plain path — resumes of old
    state are unaffected.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        bucketed_tables: tuple = (),
        bucket_key: str = "url_hash",
        n_buckets: int | None = None,
    ):
        self.spark = spark
        self.root = root
        self.bucketed = set(bucketed_tables)
        self.bucket_key = bucket_key
        self.n_buckets = n_buckets
        # per-session catalog caches: the catalog is session-scoped, so a
        # table this store has ensured stays ensured, and the set of wave
        # partitions it knows about (registered at ensure-time or appended
        # since) is exact — skipping repeat tableExists lookups and
        # provably-no-op DROP PARTITION DDL, both measured parts of the
        # per-wave serial driver floor
        self._ensured: dict[str, tuple] = {}
        self._partitions: dict[str, set] = {}
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
        if self._is_bucketed(name):
            return self._append_bucketed(name, df, wave)
        path = os.path.join(self.table_dir(name), f"wave={wave:05d}")
        df.write.mode("overwrite").parquet(path)
        return path

    def append_counted(self, name: str, df: DataFrame, wave: int) -> tuple[str, int]:
        """``append`` that also returns the written row count, carried out
        of the write job itself via an ``observe`` metric — the local
        equivalent of reading an Iceberg MERGE commit's snapshot-summary
        ``total-records``. No extra job, no post-write footer reads (the
        old ``row_count`` path, a per-wave serial driver cost)."""
        from pyspark.sql import Observation

        obs = Observation()
        path = self.append(name, df.observe(obs, F.count(F.lit(1)).alias("n")), wave)
        try:
            return path, int(obs.get["n"])
        except Exception:
            # AQE's empty-relation propagation elides the CollectMetrics
            # node when the write turns out empty (the terminal wave) —
            # fall back to the footer read, which is trivially cheap there
            return path, self.row_count(path)

    # --- bucketed tables -----------------------------------------------------

    def _spec_path(self, name: str) -> str:
        return os.path.join(self.table_dir(name), _SPEC_FILE)

    def _read_spec(self, name: str) -> dict | None:
        try:
            with open(self._spec_path(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _is_bucketed(self, name: str) -> bool:
        if name not in self.bucketed:
            return False
        if self._read_spec(name) is not None:
            return True
        # wave dirs but no spec sidecar = a pre-bucketing state dir being
        # resumed — stay on the plain path rather than corrupt its layout
        return not self.exists(name)

    def _table_ident(self, name: str) -> str:
        h = hashlib.md5(os.path.abspath(self.root).encode()).hexdigest()[:10]
        return f"crawl_{name}_{h}"

    def _ensure_bucket_table(self, name: str, df: DataFrame | None = None):
        """Register (or create) the session-catalog entry for a bucketed
        state table. The bucket spec (key, N, column DDL) is pinned in a
        sidecar JSON inside the table dir so a resuming session re-registers
        with EXACTLY the N the files were written with — a mismatched N
        would silently misattribute buckets and break join correctness."""
        ident = self._table_ident(name)
        if name in self._ensured:
            return self._ensured[name]
        spec = self._read_spec(name)
        if spec is None:
            n = self.n_buckets or int(
                self.spark.conf.get("spark.sql.shuffle.partitions", "32")
            )
            cols = [
                (f.name, f.dataType.simpleString()) for f in df.schema.fields
            ]
            spec = {"key": self.bucket_key, "n": n, "cols": cols}
            os.makedirs(self.table_dir(name), exist_ok=True)
            tmp = self._spec_path(name) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(spec, f)
            os.replace(tmp, self._spec_path(name))
        known: set = set()
        if not self.spark.catalog.tableExists(ident):
            col_ddl = ", ".join(f"`{c}` {t}" for c, t in spec["cols"])
            self.spark.sql(
                f"CREATE TABLE IF NOT EXISTS {ident} "
                f"({col_ddl}, `wave` STRING) USING parquet "
                f"PARTITIONED BY (wave) "
                f"CLUSTERED BY ({spec['key']}) SORTED BY ({spec['key']}) "
                f"INTO {spec['n']} BUCKETS "
                f"LOCATION '{self.table_dir(name)}'"
            )
            # resume in a fresh session: register the wave partitions that
            # hold bucketed files. Dirs with only plain files (empty-wave
            # markers) stay catalog-invisible on purpose — they carry no
            # rows and their unbucketed names would fail the bucketed scan.
            for d in sorted(os.listdir(self.table_dir(name))):
                p = os.path.join(self.table_dir(name), d)
                if not (d.startswith("wave=") and os.path.isdir(p)):
                    continue
                if any(_BUCKET_FILE_RE.search(fn) for fn in os.listdir(p)):
                    self.spark.sql(
                        f"ALTER TABLE {ident} ADD IF NOT EXISTS "
                        f"PARTITION (wave='{d.split('=', 1)[1]}')"
                    )
                    known.add(d.split("=", 1)[1])
        else:
            # table pre-exists in this session (another StateStore instance
            # over the same root): its partition set is unknown here — fall
            # back to listing it once so drops stay conservative
            known = {
                r["partition"].split("=", 1)[1]
                for r in self.spark.sql(f"SHOW PARTITIONS {ident}").collect()
            }
        self._ensured[name] = (ident, spec)
        self._partitions[name] = known
        return ident, spec

    def _append_bucketed(self, name: str, df: DataFrame, wave: int) -> str:
        ident, spec = self._ensure_bucket_table(name, df)
        wstr = f"{wave:05d}"
        path = os.path.join(self.table_dir(name), f"wave={wstr}")
        # idempotent wave slot (resume re-runs a wave): drop any prior
        # attempt — catalog entry AND files (external table: DROP PARTITION
        # is metadata-only). The DDL round-trip (~0.1-0.3 s of serial
        # driver time) is skipped when the session's tracked partition set
        # proves there is nothing to drop — the common every-wave case.
        if wstr in self._partitions.get(name, ()) or os.path.isdir(path):
            self.spark.sql(
                f"ALTER TABLE {ident} DROP IF EXISTS PARTITION (wave='{wstr}')"
            )
            self._partitions.setdefault(name, set()).discard(wstr)
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
        # pre-route rows by the bucket function (pmod(murmur3(key), N) —
        # identical to repartition's hashpartitioning) so each task holds
        # exactly one bucket: N files per wave, not tasks×N
        out = (
            df.select(*[c for c, _ in spec["cols"]])
            .withColumn("wave", F.lit(wstr))
            .repartition(spec["n"], F.col(spec["key"]))
        )
        prior = self.spark.conf.get(_OVERWRITE_MODE, "static")
        self.spark.conf.set(_OVERWRITE_MODE, "dynamic")
        try:
            out.write.insertInto(ident, overwrite=True)
        finally:
            self.spark.conf.set(_OVERWRITE_MODE, prior)
        self._partitions.setdefault(name, set()).add(wstr)
        if not os.path.isdir(path):
            # empty wave: dynamic overwrite writes no partition, but the
            # per-wave dir contract (manifest frontier paths, direct reads)
            # requires a schema-bearing dir. Write an empty plain file —
            # catalog-invisible (unregistered), so table reads never see it.
            self.spark.createDataFrame([], df.schema).write.mode(
                "overwrite"
            ).parquet(path)
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

        if name in self.bucketed:
            self.spark.sql(f"DROP TABLE IF EXISTS {self._table_ident(name)}")
        self._ensured.pop(name, None)
        self._partitions.pop(name, None)
        d = self.table_dir(name)
        if os.path.isdir(d):
            shutil.rmtree(d)

    def exists(self, name: str) -> bool:
        d = self.table_dir(name)
        return os.path.isdir(d) and any(p.startswith("wave=") for p in os.listdir(d))

    def read(self, name: str) -> DataFrame | None:
        if not self.exists(name):
            return None
        if self._is_bucketed(name):
            ident, _ = self._ensure_bucket_table(name)
            # snapshot isolation: a catalog table lists partitions at
            # EXECUTION time, but callers capture `seen` before appending
            # the current wave and expect the pre-append view (the old
            # glob read snapshotted dirs at plan time — same contract as
            # an Iceberg snapshot read). Pin the partitions present NOW
            # via an isin partition filter (pruning, not a data scan).
            d = self.table_dir(name)
            waves = sorted(
                w.split("=", 1)[1]
                for w in os.listdir(d)
                if w.startswith("wave=") and os.path.isdir(os.path.join(d, w))
                and any(
                    _BUCKET_FILE_RE.search(fn)
                    for fn in os.listdir(os.path.join(d, w))
                )
            )
            t = self.spark.table(ident)
            t = t.filter(F.col("wave").isin(waves) if waves else F.lit(False))
            # partition values are strings; downstream staleness checks
            # compare wave numerically. The cast is a projection on top of
            # the bucketed scan — output partitioning on the bucket key
            # survives, so joins still plan exchange-free.
            return t.withColumn("wave", F.col("wave").cast("int"))
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

        if self._is_bucketed(name) and self._read_spec(name) is not None:
            # bucketed tables bin-pack at write time (the pre-insert
            # repartition yields exactly ≤N bucket files per wave);
            # cross-wave folding would break the per-wave snapshot dirs.
            # The production equivalent is Iceberg rewrite_data_files
            # (state/iceberg.py compact()).
            return self.table_dir(name)
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
