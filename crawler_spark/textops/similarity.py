"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane signs) variant as the scale path: at 10^9 vectors the
brute-force cross join is O(Q·N) — the bucketed variant probes only vectors
sharing the query's sign-signature bucket (recall traded for a ~2^b fanout
reduction; standard practice is multi-probe over neighboring buckets).

Dot products run JVM-side via zip_with/aggregate in double precision —
no Python, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cosine(a: str, b: str):
    dot = F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0D, (s, v) -> s + v)")
    na = F.sqrt(F.expr(f"aggregate({a}, 0D, (s, v) -> s + cast(v as double) * cast(v as double))"))
    nb = F.sqrt(F.expr(f"aggregate({b}, 0D, (s, v) -> s + cast(v as double) * cast(v as double))"))
    return dot / (na * nb)


def _fp(col, scale: int = 10_000):
    """Round-half-up fixed point: ``floor(x * scale + 0.5)`` as BIGINT.

    Pure IEEE-754 double ops, so any engine that computes the same
    double ``x`` (the sequential-fold cosine above is bit-identical to a
    DuckDB list_reduce replay) produces the same integer — unlike
    ``round()``, whose decimal half-up rule is engine-specific (Spark:
    BigDecimal over the shortest repr; DuckDB: multiply-round-divide).
    Similarity outputs are therefore BIGINT basis points (``cos_bp``),
    never rounded doubles.
    """
    return F.floor(col * F.lit(float(scale)) + F.lit(0.5)).cast("long")


def _cos_bp(a: str, b: str, scale: int = 10_000):
    return _fp(_cosine(a, b), scale)


def brute_force_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos_bp) — exact top-k by cosine.

    queries is broadcast (it is the small side by construction); ranking
    quantizes the cosine to BIGINT basis points before ordering with an
    id tie-break so results are stable across engines and runs.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    pairs = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec")
    ).join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        _cos_bp("v_vec", "q_vec").alias("cos_bp"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_bp").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_bp")
    )


def _band_sig_udf(bands: list):
    """Arrow-batched signature kernel: all bands' sign signatures for a
    batch of vectors in one pass. Vectorized ACROSS rows but strictly
    left-to-right ACROSS dimensions (``acc = acc + v[:,d]*p[d]`` from
    acc=0.0), so every dot product is bit-identical to the
    ``aggregate(zip_with(...), 0.0, +)`` fold the DuckDB oracle replays
    — exactness preserved, but one Arrow batch per task instead of
    Catalyst interpreting 18 higher-order-function lambdas per row
    (which made LSH bucketing the bench's slowest stage). A GEMM would
    be faster still but reorders the summation, and sign(dot) near zero
    must not depend on the engine."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    bands_arr = [np.asarray(b, dtype=np.float64) for b in bands]

    # no type hints: `from __future__ import annotations` stringifies
    # them, which pandas_udf's inference rejects — SCALAR is the default
    def sig_udf(vecs):
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)
        n, d = mat.shape
        out = np.zeros((n, len(bands_arr)), dtype=np.int64)
        for bi, planes in enumerate(bands_arr):
            sig = np.zeros(n, dtype=np.int64)
            for pi in range(planes.shape[0]):
                p = planes[pi]
                acc = np.zeros(n, dtype=np.float64)
                for k in range(d):
                    acc = acc + mat[:, k] * p[k]
                sig |= (acc >= 0).astype(np.int64) << pi
            out[:, bi] = sig
        return pd.Series(list(out))

    return F.pandas_udf(sig_udf, ArrayType(LongType()))


def _band_buckets(df: DataFrame, bands: list, id_col: str, vec_col: str,
                  out_id: str) -> DataFrame:
    """(out_id, band, bucket) for every band in ONE scan of ``df`` —
    the batched signature kernel computes every band's bucket at once
    and posexplode fans them out, instead of re-scanning the vectors
    once per band."""
    sig = _band_sig_udf(bands)
    return df.select(
        F.col(id_col).alias(out_id), sig(F.col(vec_col)).alias("_sigs")
    ).select(out_id, F.posexplode("_sigs").alias("band", "bucket"))


def hyperplane_bucket(df: DataFrame, planes: list, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Sign-signature bucket id from fixed random hyperplanes (list of
    python float lists). bits = sign(v·p), via the batched kernel."""
    sig = _band_sig_udf([planes])
    return df.select(
        F.col(id_col), F.col(vec_col),
        F.try_element_at(sig(F.col(vec_col)), F.lit(1)).alias("bucket"),
    )


def _gemm_candidate_pairs(
    v: DataFrame, threshold: float, n_blocks: int, group_cols: tuple = (),
    witness_only: bool = False,
) -> DataFrame:
    """Blocked all-pairs candidate generation: ``v`` is ``(id long, vec,
    *group_cols)``; emits every ``(id_a < id_b)`` pair (within the same
    group when ``group_cols`` given) whose BLAS-GEMM cosine clears
    ``threshold - slack``.

    Rows are hashed into ``n_blocks`` blocks and replicated into the
    n_blocks·(n_blocks+1)/2 unordered block-pair tiles, so no single
    task ever sees more than ~2·|group|/n_blocks rows — this is the
    skew guard for degenerate groups (a one-cluster corpus of identical
    embeddings becomes many bounded tiles, not one quadratic task).
    BLAS reorders double summation, so these cosines are candidates
    only: callers re-score survivors with the sequential-fold
    ``_cos_bp`` for exact, engine-portable results.

    ``witness_only=True`` is for callers that only need "does SOME
    lower-id near-dup exist for this id" (the SemDeDup keep flag): each
    tile emits, per ``id_b``, the minimum ``id_a`` among its *certainly*
    passing pairs (GEMM cos >= threshold + slack, guaranteed true) plus
    every pair in the uncertainty band [threshold - slack, threshold +
    slack) for exact adjudication. Output is then LINEAR in the group
    size (<= rows x tiles-per-row + boundary pairs) even when the whole
    group is one duplicate blob — the star-edge analog of the minhash
    mega-bucket cap — and the verified keep set is provably identical
    to the all-pairs join's.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    gcols = list(group_cols)
    v = v.withColumn(
        "blk", F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int")
    )
    # replicate each row into every block-pair tile it participates in
    tiles = F.array(*(
        [F.struct(F.col("blk").alias("ga"), F.lit(b).cast("int").alias("gb"))
         for b in range(n_blocks)]
    ))
    expl = (
        v.select(*gcols, "id", "vec", "blk", F.explode(tiles).alias("t"))
        .select(
            *gcols, "id", "vec", "blk",
            F.least("blk", F.col("t.gb")).alias("ga"),
            F.greatest("blk", F.col("t.gb")).alias("gb"),
        )
        .dropDuplicates(gcols + ["id", "ga", "gb"])
    )
    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
        ]
    )
    # BLAS slack: double-precision GEMM cosines are within ~1e-12 of the
    # exact fold; 1e-6 is orders of magnitude more than enough to never
    # drop a true >= threshold pair before the exact verify.
    slack = 1e-6

    def gemm(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ga, gb = key[-2], key[-1]
        mat = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
        ids = pdf["id"].to_numpy()
        blks = pdf["blk"].to_numpy()
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        if ga == gb:
            sims = unit @ unit.T
            ia, ib = np.triu_indices(len(ids), k=1)
            id_a, id_b, cs = ids[ia], ids[ib], sims[ia, ib]
        else:
            am, bm = blks == ga, blks == gb
            sims = unit[am] @ unit[bm].T
            id_a = np.repeat(ids[am], bm.sum())
            id_b = np.tile(ids[bm], am.sum())
            cs = sims.ravel()
        keep = cs >= threshold - slack
        lo = np.minimum(id_a, id_b)[keep]
        hi = np.maximum(id_a, id_b)[keep]
        if not witness_only:
            return pd.DataFrame({"id_a": lo, "id_b": hi})
        cs = cs[keep]
        certain = cs >= threshold + slack
        out = pd.DataFrame({"id_a": lo, "id_b": hi})
        # one certain witness per id_b + every boundary-band pair
        wit = (
            out[certain].groupby("id_b", as_index=False)["id_a"].min()
            [["id_a", "id_b"]]
        )
        return pd.concat([wit, out[~certain]], ignore_index=True)

    return expl.groupBy(*gcols, "ga", "gb").applyInPandas(gemm, out_schema)


def cosine_dup_pairs(
    vectors: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding", n_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cos_bp ≥ bp).

    Exact all-pairs baseline as a *distributed blocked GEMM*: vectors are
    hashed into ``n_blocks`` blocks, every unordered block pair (a ≤ b)
    becomes one ``applyInPandas`` group, and each group computes its
    similarity tile with one numpy matmul — Arrow-batched, no driver
    collect, no per-pair lambda interpretation (Spark's zip_with/aggregate
    higher-order funcs are interpreted, ~100× slower per pair). Each row is
    replicated n_blocks times; tile count is n_blocks·(n_blocks+1)/2, so
    parallelism scales quadratically in n_blocks while replication scales
    linearly — the standard all-pairs trade. Scale path at 10^9 vectors:
    LSH candidate generation + per-pair verify (``cosine_dup_pairs_lsh``).

    The GEMM is a *candidate generator* with a small slack under the
    threshold (BLAS reorders double summation, so its cosines are not
    bit-reproducible); the survivors — a vanishing fraction of the pair
    space — are re-scored with the sequential-fold cosine and emitted as
    BIGINT basis points, so the final pair set and scores are exact and
    engine-portable.
    """
    v = vectors.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
    )
    cands = _gemm_candidate_pairs(v, threshold, n_blocks)
    bp = int(round(threshold * 10_000))
    va = vectors.select(F.col(id_col).cast("long").alias("id_a"), F.col(vec_col).alias("va"))
    vb = vectors.select(F.col(id_col).cast("long").alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cands.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b", _cos_bp("va", "vb").alias("cos_bp"))
        .filter(F.col("cos_bp") >= bp)
    )


def cosine_dup_pairs_lsh(
    vectors: DataFrame, planes_bands: list, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs via LSH candidate generation + exact verification.

    planes_bands: list of plane-lists; each band buckets independently and
    candidates are the union of same-bucket pairs — the embedding analog of
    minhash band LSH. Verification recomputes the exact cosine, so false
    positives cost only compute, never correctness; false negatives are the
    standard LSH recall trade documented per band count.
    """
    sigs = _band_buckets(vectors, planes_bands, id_col, vec_col, "id")
    a = sigs.select(F.col("id").alias("id_a"), "band", "bucket")
    b = sigs.select(F.col("id").alias("id_b"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb2 = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cands.join(va, "id_a").join(vb2, "id_b")
        .select("id_a", "id_b", _cos_bp("va", "vb").alias("cos_bp"))
        .filter(F.col("cos_bp") >= int(round(threshold * 10_000)))
    )


def ivf_topk(
    vectors: DataFrame, queries: DataFrame, n_centroids: int = 8, n_probe: int = 2,
    k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: partition vectors by nearest centroid, probe only the
    query's ``n_probe`` nearest inverted lists.

    Centroids are a deterministic id-stratified sample of the vectors
    themselves (no iterative k-means — at 100TB you train centroids offline
    once and broadcast them; the assignment/probe dataflow here is the
    production shape). All distance math is JVM-side via the same
    zip_with/aggregate expressions as the exact path.
    """
    from pyspark.sql import Window

    # trained centroids when provided (kmeans_centroids), else the
    # deterministic id-stratified sample: first n_centroids vectors by id
    cents = centroids if centroids is not None else (
        vectors.orderBy(F.col(id_col).asc()).limit(n_centroids)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
    )

    def assign(df, idc, vc, keep: int):
        """nearest-`keep` centroids per row via broadcast join + rank."""
        scored = df.join(F.broadcast(cents)).select(
            F.col(idc), F.col(vc),
            F.col("cent_id"), _cos_bp(vc, "cent_vec", 1_000_000).alias("csim"),
        )
        w = Window.partitionBy(idc).orderBy(F.col("csim").desc(), F.col("cent_id").asc())
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= keep)
            .drop("_r", "csim")
        )

    inv = assign(
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec")),
        "neighbor_id", "v_vec", 1,
    )
    probes = assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "query_id", "q_vec", n_probe,
    )
    pairs = inv.join(F.broadcast(probes), on="cent_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id", "neighbor_id", _cos_bp("v_vec", "q_vec").alias("cos_bp")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_bp").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_bp")
    )


def lsh_topk(
    vectors: DataFrame, queries: DataFrame, planes: list, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN: rank only among vectors sharing a hyperplane bucket with the
    query in ANY band (OR-amplified LSH — the scale path).

    ``planes`` is either one band (list of plane vectors) or a list of
    bands. A single band of p planes keeps recall ≈ (1 - θ/π)^p, which
    collapses for weakly-similar corpora; B bands recover
    1 - (1 - r^p)^B while still pruning the candidate set ~2^p-fold per
    band. Candidates are deduped across bands before the exact cosine."""
    from pyspark.sql import Window

    if planes and isinstance(planes[0][0], (int, float)):
        planes = [planes]
    vb = _band_buckets(vectors, planes, id_col, vec_col, "neighbor_id")
    qb = _band_buckets(queries, planes, id_col, vec_col, "query_id")
    cands = (
        vb.join(F.broadcast(qb), on=["band", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    scored = cands.join(v, "neighbor_id").join(F.broadcast(q), "query_id").select(
        "query_id", "neighbor_id", _cos_bp("v_vec", "q_vec").alias("cos_bp")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_bp").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_bp")
    )

def semantic_dedup(
    vectors: DataFrame, n_centroids: int = 8, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: DataFrame | None = None, n_sub_blocks: int = 8,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding
    space, then prune near-duplicate pairs WITHIN each cluster only — the
    k-means partition bounds the pair search so the corpus never sees an
    all-pairs join (the paper dedups LAION/C4-scale corpora this way;
    within a cluster, docs whose pairwise cosine exceeds the threshold
    collapse to one representative).

    Centroids are the same deterministic id-stratified sample as
    ``ivf_topk`` (offline-trained k-means in production — the broadcast
    assignment dataflow is identical either way). Keep rule: the lowest
    id in each near-dup pair survives (the paper keeps one random/medoid
    example; lowest-id is the deterministic, oracle-replayable choice).

    Scale shape: assignment is a broadcast join + per-id window (one
    shuffle on the id); the pair search runs the blocked-GEMM tiler
    *within* each cluster (``_gemm_candidate_pairs`` grouped by
    cent_id), so a degenerate cluster — every embedding identical, one
    cluster holding the corpus — still fans out into
    n_sub_blocks·(n_sub_blocks+1)/2 bounded tiles instead of one
    quadratic task: the same skew guard the minhash band join has.
    GEMM survivors are re-verified with the exact sequential-fold
    cosine, so the keep set is bit-identical to the unsalted join.
    Output keeps one row per vector with its cluster and keep flag.
    """
    from pyspark.sql import Window

    cents = centroids if centroids is not None else (
        vectors.orderBy(F.col(id_col).asc()).limit(n_centroids)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
    )
    scored = vectors.join(F.broadcast(cents)).select(
        F.col(id_col), F.col(vec_col), F.col("cent_id"),
        _cos_bp(vec_col, "cent_vec", 1_000_000).alias("csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col("cent_id").asc())
    # persisted: consumed three times (pair tiler + verify join + the final
    # keep-flag join) — without it Spark recomputes the assignment per branch
    from pyspark.storagelevel import StorageLevel

    inv = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r", "csim")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cands = _gemm_candidate_pairs(
        inv.select(
            F.col("cent_id"),
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).alias("vec"),
        ),
        threshold, n_sub_blocks, group_cols=("cent_id",), witness_only=True,
    )
    va = inv.select(F.col(id_col).cast("long").alias("id_a"), F.col(vec_col).alias("va"))
    vb = inv.select(F.col(id_col).cast("long").alias("id_b"), F.col(vec_col).alias("vb"))
    bp = int(round(threshold * 10_000))
    dups = (
        cands.join(va, "id_a").join(vb, "id_b")
        .filter(_cos_bp("va", "vb") >= bp)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        inv.select(id_col, "cent_id")
        .join(dups, id_col, "left")
        .select(
            id_col, "cent_id",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )


def kmeans_lloyd(
    vectors: DataFrame,
    k: int = 4,
    iters: int = 2,
    scale: int = 1000,
    offset: float = 2.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd k-means over an embedding column — the offline
    centroid-training step that :func:`semantic_dedup` and :func:`ivf_topk`
    assume exists ("production trains centroids offline"); this is that
    trainer, as pure DataFrame jobs.

    Everything runs in INTEGER FIXED POINT so a distributed run is
    bit-identical under any partitioning AND replayable by an ANSI-SQL
    oracle: vectors quantize to ``floor((x + offset) * scale)`` bigints
    (``offset`` shifts the domain positive, so integer division has no
    floor-vs-truncate ambiguity between engines; squared-L2 is shift-
    invariant, so assignments are unaffected), distances are exact bigint
    sums, and the centroid update is the per-dimension integer mean
    (``sum div count`` — order-independent, unlike float summation).

    Init: the ``k`` lowest-id vectors (deterministic; k-means|| at scale —
    the per-iteration dataflow is identical). Each iteration broadcasts
    the k centroids as literals (argmin = array_min over k struct columns
    inside codegen — no join, no shuffle for assignment), then computes
    new centroids with ONE groupBy(cluster, dim) shuffle of k·dims tiny
    rows; only k·dims values ever reach the driver. Empty clusters keep
    their previous centroid. Returns the final assignment
    ``(id, cluster, dist)`` against the post-update centroids.
    """
    from pyspark.storagelevel import StorageLevel

    qv = vectors.select(
        F.col(id_col),
        F.expr(
            f"transform({vec_col}, x -> "
            f"cast(floor((cast(x as double) + {offset}) * {scale}) as bigint))"
        ).alias("qv"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # edge guards: empty input returns an empty typed frame; fewer rows
    # than k clamps k to the available centroid count (otherwise the
    # empty-cluster fallback would index past the collected list)
    first = qv.select("qv").head(1)
    if not first:
        out = vectors.sparkSession.createDataFrame(
            [], f"{id_col} {dict(vectors.dtypes)[id_col]}, cluster int, dist bigint"
        )
        out._kmeans_centroids = []  # type: ignore[attr-defined]
        return out
    dims = len(first[0]["qv"])
    cents = [list(r["qv"]) for r in qv.orderBy(F.col(id_col).asc()).limit(k).collect()]
    k = len(cents)

    def _assign(df):
        structs = []
        for ci, c in enumerate(cents):
            arr = F.array(*[F.lit(int(v)).cast("long") for v in c])
            dist = F.aggregate(
                F.zip_with(F.col("qv"), arr, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda s, v: s + v,
            )
            structs.append(
                F.struct(dist.alias("dist"), F.lit(ci).cast("int").alias("cluster"))
            )
        best = F.array_min(F.array(*structs))
        return df.select(
            F.col(id_col), F.col("qv"),
            best["cluster"].alias("cluster"), best["dist"].alias("dist"),
        )

    for _ in range(iters):
        means = (
            _assign(qv)
            .select("cluster", F.posexplode("qv").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.expr("sum(val) div count(*)").alias("m"))
            .collect()
        )
        by_c: dict = {}
        for r in means:
            by_c.setdefault(r["cluster"], {})[r["dim"]] = r["m"]
        cents = [
            [by_c[ci][d] for d in range(dims)] if ci in by_c else cents[ci]
            for ci in range(k)
        ]
    out = _assign(qv).select(id_col, "cluster", "dist")
    # stash the trained centroids (de-quantized) on the result so callers
    # can feed them to semantic_dedup / ivf_topk without retraining
    out._kmeans_centroids = [  # type: ignore[attr-defined]
        [v / scale - offset for v in c] for c in cents
    ]
    return out


def kmeans_centroids(
    vectors: DataFrame,
    k: int = 4,
    iters: int = 2,
    scale: int = 1000,
    offset: float = 2.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train with :func:`kmeans_lloyd` and return the centroids as a
    ``(cent_id, cent_vec)`` dimension frame — the shape
    :func:`semantic_dedup` and :func:`ivf_topk` accept via their
    ``centroids`` parameter (k rows; always broadcast downstream)."""
    assigned = kmeans_lloyd(vectors, k, iters, scale, offset, id_col, vec_col)
    spark = vectors.sparkSession
    return spark.createDataFrame(
        [(ci, [float(x) for x in c]) for ci, c in enumerate(assigned._kmeans_centroids)],
        f"cent_id int, cent_vec array<double>",
    )
