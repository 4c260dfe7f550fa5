"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, batch shape, partitioning, Arrow transfer) is
real and tested — the actual codec step is STUBBED (no image/audio libs in
this container) behind ``decode_stub``: it produces deterministic fake
features so tests can assert the pipeline end-to-end.

Pattern: ``mapInPandas`` over (id, payload binary) batches → one metadata
row per asset. At scale, payloads live in the lake and only references +
extracted features shuffle — never the bytes (hence the explicit
select-pruning in ``extract_metadata``).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("modality", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode. A real deployment swaps this for
    PIL/librosa/pyav; everything around it (batching, schema, pruning)
    is production-shaped. Raises NotImplementedError for modalities the
    stub does not fake."""
    if payload[:4] == b"\x89PNG" or payload[:2] == b"\xff\xd8":
        raise NotImplementedError("real image decode requires PIL — not in this container")
    h = hashlib.sha256(payload).digest()
    return {"modality": "fake", "width": 16 + h[0] % 64, "height": 16 + h[1] % 64}


def extract_metadata(assets: DataFrame, id_col: str = "asset_id",
                     payload_col: str = "payload") -> DataFrame:
    """binary payloads → typed metadata rows (Arrow-batched)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                try:
                    feat = decode_stub(b)
                except NotImplementedError:
                    feat = {"modality": "undecodable", "width": None, "height": None}
                out.append(
                    {
                        "asset_id": int(aid),
                        "n_bytes": len(b),
                        "sha256": hashlib.sha256(b).hexdigest(),
                        **feat,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in META_SCHEMA.fields])

    # prune to exactly the two needed columns before the Python boundary
    return assets.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, META_SCHEMA)


def frame_sample_stub(assets: DataFrame, every_n: int = 10,
                      id_col: str = "asset_id", payload_col: str = "payload") -> DataFrame:
    """Video frame-sampling plumbing: emits (asset_id, frame_idx) rows for a
    deterministic fake frame count derived from payload size (stand-in for
    pyav keyframe iteration)."""
    n_frames = (F.octet_length(F.col(payload_col)) / 100 + 1).cast("int")
    return (
        assets.select(F.col(id_col), n_frames.alias("n_frames"))
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias(
                "frame_idx"
            ),
        )
    )
