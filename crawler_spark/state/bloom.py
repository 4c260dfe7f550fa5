"""Partitioned Bloom-filter sidecar for the URL-seen set.

The explicit form of the north-star's "partitioned bloom/cuckoo-filter
URL-seen set keyed by canonicalized-URL hash": one bitset per url_hash
bucket, maintained INCREMENTALLY (each wave appends the delta bitset of
its newly-admitted hashes; probe-time OR-merges a bucket's deltas inside
the bucket's own task). The admission anti-join then runs
filter-then-verify (SURVEY §7 risk 6):

* bloom says "definitely new" → the candidate skips the exact anti-join
  entirely — at 10^10 seen URLs this is the common case for a healthy
  frontier, and it removes those rows from the dominant per-wave shuffle;
* bloom says "maybe seen" (true dups + an fpp-bounded false-positive
  tail) → the exact LEFT ANTI join verifies, so a false positive costs
  one probe row, never a lost URL;
* false negatives cannot occur by construction: every wave's admitted
  set is OR-merged into the sidecar before the next wave probes it.

Scale shape: positions are computed JVM-side (xxhash64 inside codegen);
the bitset build/OR/probe are Arrow-batched numpy bit ops in
``applyInPandas``/``cogroup`` keyed by bucket — a bucket's bitset moves
once per task, never once per row, and no stage ever shuffles the seen
table itself. Sizing: fpp ≈ (1 - e^(-k·n/m))^k with k = 7 hashes;
budget m (``nbits``) per bucket at ~10 bits per expected key — e.g.
10^10 URLs over 1024 buckets wants ~10^8 bits (12 MB) per bucket, far
below a task's memory and exactly the granularity Iceberg would persist
as puffin-style sidecar blobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# independent position seeds (k = 7 double-hashing-free xxhash64 salts)
BLOOM_SEEDS = (17, 53, 97, 193, 389, 769, 1543)

_BLOOM_SCHEMA = T.StructType(
    [T.StructField("bucket", T.IntegerType()), T.StructField("bits", T.BinaryType())]
)


def _with_bucket_positions(
    df: DataFrame, num_buckets: int, nbits: int, key: str = "url_hash"
) -> DataFrame:
    pos = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key), F.lit(int(s))), F.lit(nbits)).cast("int")
            for s in BLOOM_SEEDS
        ]
    )
    return df.withColumn(
        "_bbkt", F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)).cast("int")
    ).withColumn("_bpos", pos)


def build_bloom_delta(
    df: DataFrame, num_buckets: int = 64, nbits: int = 1 << 20, key: str = "url_hash"
) -> DataFrame:
    """(bucket, bits) delta bitsets covering exactly the keys in ``df``.
    Append the result next to the seen table each wave; the probe
    OR-merges a bucket's deltas in place."""
    import numpy as np
    import pandas as pd

    nbytes = nbits // 8

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        arr = np.zeros(nbytes, dtype=np.uint8)
        pos = np.concatenate([np.asarray(p, dtype=np.int64) for p in pdf["_bpos"]])
        np.bitwise_or.at(arr, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame(
            {"bucket": [int(pdf["_bbkt"].iloc[0])], "bits": [arr.tobytes()]}
        )

    keyed = _with_bucket_positions(df.select(key), num_buckets, nbits, key)
    return keyed.groupBy("_bbkt").applyInPandas(build, _BLOOM_SCHEMA)


def bloom_classify(
    candidates: DataFrame,
    bloom: DataFrame,
    num_buckets: int = 64,
    nbits: int = 1 << 20,
    key: str = "url_hash",
) -> DataFrame:
    """candidates + ``_maybe_seen`` boolean. False = the key is in none of
    the sidecar's deltas — definitely unseen, safe to bypass the exact
    anti-join. Cogrouped per bucket so each bitset deserializes once per
    task; a bucket with no sidecar rows (empty seen set) is all-new."""
    import numpy as np
    import pandas as pd

    out_schema = T.StructType(
        list(candidates.schema.fields)
        + [T.StructField("_maybe_seen", T.BooleanType())]
    )
    helper = ["_bbkt", "_bpos"]

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        out = left.drop(columns=helper)
        if left.empty:
            out["_maybe_seen"] = pd.Series([], dtype=bool)
            return out
        if right.empty:
            out["_maybe_seen"] = False
            return out
        bits = np.frombuffer(right["bits"].iloc[0], dtype=np.uint8).copy()
        for b in right["bits"].iloc[1:]:
            bits |= np.frombuffer(b, dtype=np.uint8)
        pos = np.vstack([np.asarray(p, dtype=np.int64) for p in left["_bpos"]])
        hit = (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        out["_maybe_seen"] = hit.all(axis=1)
        return out

    keyed = _with_bucket_positions(candidates, num_buckets, nbits, key)
    return (
        keyed.groupBy("_bbkt")
        .cogroup(bloom.groupBy("bucket"))
        .applyInPandas(probe, out_schema)
    )
