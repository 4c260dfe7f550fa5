"""Iceberg mapping for the crawl state store — DDL, MERGE statements,
and a session-conf helper.

``state/store.py`` is the sandbox stand-in (plain parquet per-wave
snapshot dirs + a JSON manifest). This module is the documented,
executable migration map to the production layout the north-star names:
Iceberg tables with ``bucket(N, url_hash)`` partitioning and MERGE
commits (reference semantics: output_sink/elasticsearch.rb:82-188 —
index-or-update keyed by the url-hash id). Nothing here imports Iceberg
classes; it emits standard Spark SQL strings, so it is testable in this
container (no iceberg-spark-runtime jar is available here) and drops
into any Spark cluster that has the runtime jar by calling
``iceberg_session_confs`` and executing ``ddl()`` / ``merge_seen()``.

Why bucketing is the whole story at 10^10 URLs: the dominant per-wave
cost is the seen anti-join (new candidates LEFT ANTI seen) and the seen
MERGE. With both sides stored bucketed by ``url_hash`` into the same N,
Spark's storage-partitioned join (SPARK-37375, Iceberg's
``bucket``-transform compatibility) executes the join with ZERO
exchanges — each task reads matching buckets from both tables. The
per-wave shuffle of the 10^10-row seen table disappears; only the
wave-sized candidate delta moves. ``tests/test_bucketed_state_join.py``
proves the plan shape with Spark's built-in bucketed tables (same
physical mechanism, catalog-agnostic).

Stand-in → Iceberg migration map (one line each):

===================  =============================================
parquet stand-in      Iceberg equivalent
===================  =============================================
``wave=NNNNN/`` dir   snapshot (commit) — time travel replaces dirs
``manifest.json``     snapshot summary + table properties
``store.append``      ``INSERT INTO`` (fast append commit)
seen merge-on-read    ``MERGE INTO seen`` (copy-on-write or MoR)
``store.compact``     ``rewrite_data_files`` + ``expire_snapshots``
``store.reset``       ``DROP TABLE`` / ``DELETE FROM`` + vacuum
bloom sidecar         puffin blobs / per-bucket sidecar table
``row_count``         snapshot summary ``total-records`` (free)
===================  =============================================
"""

from __future__ import annotations

# column DDL per state table, mirrored from the frames the crawl plan
# writes (plans/crawl.py FRONTIER_COLS, operators/parse.py PARSED_SCHEMA)
_SEEN_COLS = """
  url_hash     BINARY,
  norm_url     STRING,
  kind         STRING,
  depth        INT,
  source_url   STRING,
  parent_seq   BIGINT,
  seq          BIGINT,
  redirect_chain ARRAY<STRING>,
  crawl_delay_ms BIGINT
"""

_PARSED_COLS = """
  url_hash     BINARY,
  norm_url     STRING,
  warc_ts      TIMESTAMP,
  status       INT,
  kind         STRING,
  title        STRING,
  body         STRING,
  meta_keywords STRING,
  meta_description STRING,
  headings     ARRAY<STRING>,
  indexed_links ARRAY<STRING>,
  meta_noindex BOOLEAN,
  attachment   STRING,
  redirect_chain ARRAY<STRING>
"""


def iceberg_session_confs(
    catalog: str = "crawl", warehouse: str = "s3://crawl-state/warehouse"
) -> dict:
    """Spark confs enabling an Iceberg catalog + storage-partitioned
    joins. Requires the iceberg-spark-runtime jar on the cluster
    (``spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-
    4.0_2.13:<ver>`` — not available in this container, hence a dict to
    merge into the builder rather than a hard dependency)."""
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        # storage-partitioned joins: bucket-compatible tables join with
        # zero exchanges (the point of bucketing the seen set)
        "spark.sql.sources.v2.bucketing.enabled": "true",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled": "true",
        "spark.sql.requireAllClusterKeysForCoPartition": "false",
        "spark.sql.iceberg.planning.preserve-data-grouping": "true",
    }


def ddl(catalog: str = "crawl", db: str = "state", n_buckets: int = 1024) -> dict:
    """CREATE TABLE statements for the crawl state, all bucketed by
    url_hash so every state⋈state and candidates⋈state operation is a
    storage-partitioned join. 1024 buckets ≈ 10^7 URLs/bucket at the
    10^10 north-star scale (~a few hundred MB of url_hash+metadata per
    bucket — one task's comfortable working set)."""
    t = f"{catalog}.{db}"
    return {
        "seen": f"""
            CREATE TABLE IF NOT EXISTS {t}.seen ({_SEEN_COLS})
            USING iceberg
            PARTITIONED BY (bucket({n_buckets}, url_hash))
            TBLPROPERTIES (
              'write.distribution-mode' = 'hash',
              'write.merge.mode' = 'merge-on-read',
              'format-version' = '2'
            )""",
        "parsed": f"""
            CREATE TABLE IF NOT EXISTS {t}.parsed ({_PARSED_COLS}, wave INT)
            USING iceberg
            PARTITIONED BY (wave, bucket({n_buckets}, url_hash))
            TBLPROPERTIES ('format-version' = '2')""",
        "frontier": f"""
            CREATE TABLE IF NOT EXISTS {t}.frontier ({_SEEN_COLS}, wave INT)
            USING iceberg
            PARTITIONED BY (bucket({n_buckets}, url_hash))
            TBLPROPERTIES ('format-version' = '2')""",
    }


def merge_seen(catalog: str = "crawl", db: str = "state") -> str:
    """The per-wave seen MERGE (reference: elasticsearch.rb:82-188
    index-or-update keyed by id). ``admitted`` is the wave's candidate
    delta registered as a temp view. Because both sides bucket on
    url_hash, this MERGE shuffles only the delta — never the table."""
    return f"""
        MERGE INTO {catalog}.{db}.seen t
        USING admitted s
        ON t.url_hash = s.url_hash
        WHEN NOT MATCHED THEN INSERT *
    """


def compact(catalog: str = "crawl", db: str = "state", table: str = "seen") -> list:
    """The production form of ``store.compact`` (bin-pack + history
    expiry as metadata-only commits)."""
    t = f"{catalog}.{db}.{table}"
    return [
        f"CALL {catalog}.system.rewrite_data_files(table => '{db}.{table}')",
        f"CALL {catalog}.system.expire_snapshots(table => '{db}.{table}', "
        f"retain_last => 2)",
    ]
