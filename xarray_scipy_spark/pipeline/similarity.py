"""Similarity search over embedding columns: cosine top-k.

No reference analog. Two physical strategies:

- :func:`cosine_topk` — brute-force: broadcast the (small) query set
  against the full corpus, rank per query. Exact; the baseline. Cost
  O(Q·N·d) but embarrassingly parallel and shuffle-free on the corpus
  side (queries are broadcast, ranking shuffles only Q·k-ish rows
  after the per-partition window).
- :func:`cosine_topk_ivf` — IVF-style: corpus is bucketed by a coarse
  quantizer cell (here the precomputed ``label`` column stands in for
  a k-means cell id); each query probes only its own cell. The join
  becomes a bucket equi-join and the scanned fraction drops to ~1/C.
  This is the 100 TB path: cells map to partition pruning when the
  corpus is written partitioned by cell.

All arithmetic is JVM higher-order functions (``zip_with`` +
``aggregate``) — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .hashes import spread

__all__ = [
    "cosine_topk",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "kmeans_cells",
    "quantize_embeddings",
    "embedding_moments",
    "pca_from_moments",
    "pca_project",
    "fit_pca",
    "embedding_pca",
    "label_outliers",
]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _normed(df: DataFrame, id_col: str, vec_col: str, extra: list[str]) -> DataFrame:
    v = F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    out = df.select(F.col(id_col), v, *[F.col(c) for c in extra])
    return out.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    max_broadcast_queries: int | None = 65_536,
) -> DataFrame:
    """Exact top-k nearest neighbors by cosine for each query vector.

    Physical plan (the blocked-matmul shape that makes the exact path
    competitive, same design as ``embedding_dup_pairs``'s exact mode):
    the query side is collected to the driver (bounded by
    ``max_broadcast_queries`` — the moral broadcast) and rides into an
    Arrow-batched ``mapInPandas`` over the corpus, where one BLAS
    matmul per batch scores every (corpus row, query) pair — no
    interpreted per-element lambdas, no Q·N row explosion. Each batch
    emits only its top-k candidates per query (with a
    ``10^-round_digits`` tie slack so post-UDF rounding cannot change
    the global winner set); the final exact ranking is a window over
    ~partitions·Q·k candidate rows.

    Ranking is deterministic — ties broken by neighbor id on the
    similarity rounded to ``round_digits`` (so independent engines
    agree; the rounding itself happens JVM-side with Spark's
    HALF_UP ``round``, matching the SQL oracle).

    Large query sets don't fit a driver/executor broadcast: beyond
    ``max_broadcast_queries`` this refuses rather than degrade — route
    those to :func:`cosine_topk_ivf` (cell-pruned) or
    :func:`cosine_topk_lsh` (bucketed, approximate).
    ``max_broadcast_queries=None`` lifts the cap for callers that know
    their size (the collect itself is inherent to the strategy).

    Output: ``(query_id, rank, neighbor_id, cos_sim)``.
    """
    import numpy as np
    import pandas as pd

    qside = queries.select(id_col, vec_col)
    if max_broadcast_queries is not None:
        # Count BEFORE collect: the guard must refuse without ever
        # materializing an oversized query set on the driver. limit(cap+1)
        # bounds the count job itself — Spark stops scanning once cap+1
        # rows exist, so even a pathological query side costs O(cap).
        probe = qside.limit(max_broadcast_queries + 1).count()
        if probe > max_broadcast_queries:
            raise ValueError(
                f"query side exceeds max_broadcast_queries="
                f"{max_broadcast_queries}: a broadcast cross join at this "
                "size is a scale hazard — use cosine_topk_ivf / "
                "cosine_topk_lsh, or raise the limit explicitly"
            )
    qrows = qside.collect()
    id_type = dict(corpus.dtypes)[id_col]
    out_schema = f"query_id {id_type}, neighbor_id {id_type}, cos_sim double"
    spark = corpus.sparkSession
    if not qrows:
        return spark.createDataFrame(
            [], f"query_id {id_type}, rank int, neighbor_id {id_type}, cos_sim double"
        )
    q_ids = np.array([r[0] for r in qrows])
    qm = np.array([r[1] for r in qrows], dtype=float)
    qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-300)
    eps = 2.0 * 10.0 ** (-round_digits)
    q_block = 4096  # bounds the per-batch (B × Qblock) score matrix

    def run(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            cm = np.array(pdf[vec_col].tolist(), dtype=float)
            cm /= np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-300)
            outs = []
            for j0 in range(0, len(q_ids), q_block):
                qi = q_ids[j0 : j0 + q_block]
                sims = cm @ qm[j0 : j0 + q_block].T  # (B, Qblock)
                sims[ids[:, None] == qi[None, :]] = -np.inf
                if sims.shape[0] > k:
                    kth = np.partition(sims, -k, axis=0)[-k, :]
                else:
                    kth = np.full(sims.shape[1], -np.inf)
                ii, jj = np.nonzero(sims >= kth[None, :] - eps)
                # When a batch has <= k rows, kth is -inf and the masked
                # self-similarities (-inf) pass `-inf >= -inf` — drop all
                # non-finite candidates so self-matches never surface.
                finite = np.isfinite(sims[ii, jj])
                ii, jj = ii[finite], jj[finite]
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": qi[jj],
                            "neighbor_id": ids[ii],
                            "cos_sim": sims[ii, jj],
                        }
                    )
                )
            yield pd.concat(outs) if outs else pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cos_sim": []}
            )

    # no spread() here: matmul work scales with BYTES (unlike the
    # tokenize/hash pipelines whose per-row fan-out dwarfs their input),
    # so Spark's own maxPartitionBytes file splitting yields the right
    # parallelism at scale, and a forced 32-way exchange on a small
    # corpus only adds a shuffle + per-task Python overhead
    candidates = corpus.select(id_col, vec_col).mapInPandas(run, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        candidates.withColumn("cos_sim", F.round("cos_sim", round_digits))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def srp_bucket(vcol: Column, planes: int, dim: int) -> Column:
    """Signed-random-projection bucket: bit ``p`` is the sign of the dot
    with deterministic hyperplane ``p`` (:func:`..dedup.srp_plane`
    literals — JVM-evaluated, reproducible in SQL)."""
    from .dedup import srp_plane

    bucket = None
    for p in range(planes):
        plane = F.array(*[F.lit(srp_plane(p, d)) for d in range(dim)])
        bit = F.when(_dot(vcol, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    planes: int = 8,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """LSH-bucketed top-k: corpus and queries hash to signed-random-
    projection buckets; each query scans only its probed buckets.

    ``probes=1`` probes the query's own bucket; ``probes=1+m`` also
    probes the ``m`` buckets at Hamming distance 1 (lowest plane bits
    flipped) — the standard multiprobe recall/cost dial. Candidate
    volume is ~``probes·N/2^planes`` per query; at scale the bucket
    column doubles as a partition key so probes prune to partitions.
    Approximate by construction: neighbors hashing elsewhere are
    missed with probability ``1 - (1-θ/π)^planes``-ish per plane
    disagreement (the LSH trade).
    """
    if not 1 <= probes <= planes + 1:
        raise ValueError(f"probes must be in [1, planes+1], got {probes}")
    dim = len(corpus.select(vec_col).first()[0])
    c = _normed(spread(corpus, id_col), id_col, vec_col, []).withColumn(
        "bucket", srp_bucket(F.col("v"), planes, dim)
    ).alias("c")
    q = _normed(queries, id_col, vec_col, []).withColumn(
        "bucket", srp_bucket(F.col("v"), planes, dim)
    )
    probe_list = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(probes - 1)],
    )
    q = q.withColumn("probe", F.explode(probe_list)).alias("q")
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("q.probe") == F.col("c.bucket"))
            & (F.col(f"q.{id_col}") != F.col(f"c.{id_col}")),
        )
        .select(
            F.col(f"q.{id_col}").alias("query_id"),
            F.col(f"c.{id_col}").alias("neighbor_id"),
            F.round(
                _dot(F.col("q.v"), F.col("c.v"))
                / (F.col("q.nrm") * F.col("c.nrm")),
                round_digits,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def kmeans_cells(
    df: DataFrame,
    *,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Lloyd k-means cell assignment — the IVF coarse-quantizer build.

    Deterministic by construction so independent engines reproduce it:
    initial centroids are the vectors with the ``k`` smallest ids,
    distances are ROUNDED to ``round_digits`` before the argmin (ties →
    smaller cell index), and each updated centroid (per-dimension mean)
    is rounded the same way before the next round — the rounding
    absorbs float-summation-order differences that would otherwise make
    the assignment depend on partition order.

    Execution: assignment is a ``mapInPandas`` scan against the
    broadcast k×d centroid matrix (tiny closure state, the standard
    Lloyd-on-Spark shape); the update is one groupBy per iteration.
    Only the k×d centroid matrix ever reaches the driver.

    Returns ``(id_col, cell)``.
    """
    import numpy as np
    import pandas as pd

    v = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    id_type = dict(df.dtypes)[id_col]
    init = v.orderBy(id_col).limit(k).collect()
    if len(init) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(init)}")
    centroids = np.asarray([r["v"] for r in init], dtype=float)

    def assigner(cents: np.ndarray):
        def run(batches):
            for pdf in batches:
                x = np.stack(pdf["v"].to_numpy())
                d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                cell = np.argmin(np.round(d2, round_digits), axis=1)
                out = pd.DataFrame({id_col: pdf[id_col].to_numpy()})
                out["cell"] = cell.astype(np.int32)
                yield out[[id_col, "cell"]]

        return run

    assigned = None
    dim = centroids.shape[1]
    for t in range(iters):
        assigned = spread(v, id_col).mapInPandas(
            assigner(centroids), schema=f"{id_col} {id_type}, cell int"
        )
        if t == iters - 1:
            break  # the returned assignment follows the LAST centroids
        means = (
            assigned.join(v, id_col)
            .groupBy("cell")
            .agg(*[F.round(F.avg(F.col("v")[i]), round_digits).alias(f"c{i}") for i in range(dim)])
            .collect()
        )
        new_c = centroids.copy()  # empty cells keep their old centroid
        for r in means:
            new_c[r["cell"]] = [r[f"c{i}"] for i in range(dim)]
        centroids = new_c
    return assigned


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    round_digits: int = 6,
) -> DataFrame:
    """IVF-bucketed top-k: each query only scans its own coarse cell.

    The equi-join on ``cell_col`` replaces the cross join — candidate
    volume drops from N to N/C per query, and with a cell-partitioned
    corpus layout the scan prunes to matching partitions. Recall is
    exact for neighbors in the probed cell (single-probe IVF
    semantics).
    """
    c = _normed(spread(corpus, id_col), id_col, vec_col, [cell_col]).alias("c")
    q = _normed(queries, id_col, vec_col, [cell_col]).alias("q")
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col(f"q.{cell_col}") == F.col(f"c.{cell_col}"))
            & (F.col(f"q.{id_col}") != F.col(f"c.{id_col}")),
        )
        .select(
            F.col(f"q.{id_col}").alias("query_id"),
            F.col(f"c.{id_col}").alias("neighbor_id"),
            F.round(
                _dot(F.col("q.v"), F.col("c.v"))
                / (F.col("q.nrm") * F.col("c.nrm")),
                round_digits,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def quantize_embeddings(
    df: DataFrame,
    *,
    id_col: str = "emb_id",
    vec_col: str = "vec",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-dimension scalar quantization of an embedding
    column — the standard 4× (int8) memory/bandwidth lever for
    vector search at corpus scale. Two-pass plan:

    1. one aggregation computes the per-dimension max |x| over the
       corpus: posexplode to (dim, |x|) then ``groupBy(dim).max`` —
       the hash aggregate's map-side combine reduces every task to
       ≤ d rows before the shuffle, so only d·n_tasks tiny rows move
       and d doubles reach the driver, broadcast back as a literal;
    2. a pure projection emits ``q[i] = round(x[i] / scale[i] ·
       (2^(bits−1) − 1))`` clamped to the signed range, plus the
       per-dim scales so consumers can dequantize.

    Everything is Catalyst array arithmetic (zip_with / transform) —
    no Python, no shuffle beyond the one scale aggregation. Output:
    ``(id, qvec array<int>, scales array<double>)``. Dimensions that
    are identically zero quantize to zero (scale pinned to 1 to avoid
    0/0).
    """
    if not (2 <= bits <= 16):
        raise ValueError(f"bits must be in [2, 16], got {bits}")
    qmax = float(2 ** (bits - 1) - 1)
    v = F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    rows = (
        df.select(F.posexplode(v).alias("pos", "a"))
        .groupBy("pos")
        .agg(F.max("a").alias("m"))
        .collect()
    )
    absmax = [m for _, m in sorted((r["pos"], r["m"]) for r in rows)]
    scales = [m if m and m > 0 else 1.0 for m in absmax]
    sc = F.array(*[F.lit(float(s)) for s in scales])
    q = F.zip_with(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        sc,
        lambda x, s: F.greatest(
            F.lit(-qmax - 1.0),
            F.least(F.lit(qmax), F.round(x / s * F.lit(qmax), 0)),
        ).cast("int"),
    )
    return df.select(F.col(id_col), q.alias("qvec"), sc.alias("scales"))


def embedding_moments(
    df: DataFrame,
    *,
    vec_col: str = "vec",
):
    """Distributed first/second moments of an embedding column.

    One ``mapInPandas`` pass computes per-batch partials of (count,
    Σx, ΣxxT) — each partition contributes ONE row of d + d² doubles
    regardless of its row count, so the driver combine handles
    d=64 · n_partitions floats, never the corpus.

    Returns ``(n, mean, cov)``: the row count, the d-vector mean and
    the biased d×d covariance ``G/n − μμᵀ`` (numpy arrays).
    """
    import numpy as np
    import pandas as pd

    def partial(batches):
        for pdf in batches:
            m = np.array(pdf[vec_col].tolist(), dtype=float)
            if not len(m):
                continue
            yield pd.DataFrame(
                {
                    "n": [len(m)],
                    "s": [m.sum(axis=0).tolist()],
                    "g": [(m.T @ m).ravel().tolist()],
                }
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partial, "n bigint, s array<double>, g array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("cannot fit PCA on an empty corpus")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]) for r in rows], axis=0)
    d = len(s)
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    return n, mean, cov


def pca_from_moments(mean, cov, k: int):
    """Driver-side eigendecomposition of a (mean, cov) pair: top-``k``
    eigenvalues (descending) and a (k, d) component matrix with
    deterministic sign canonicalization (largest-|component| positive).
    Closed over d, not n — the corpus never reaches the driver."""
    import numpy as np

    d = len(mean)
    if not (1 <= k <= d):
        raise ValueError(f"k must be in [1, {d}], got {k}")
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    vals = eigvals[order]
    comps = eigvecs[:, order].T  # (k, d)
    for i in range(k):  # deterministic sign: largest |component| positive
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return vals, comps


def fit_pca(
    df: DataFrame,
    k: int,
    *,
    vec_col: str = "vec",
):
    """Fit a PCA basis over an embedding column at corpus scale: the
    :func:`embedding_moments` partial-aggregation pass followed by the
    :func:`pca_from_moments` driver eigh.

    Returns ``(eigvals, components, mean)``: top-``k`` eigenvalues
    (descending), a (k, d) component matrix, and the d-vector mean.
    """
    _n, mean, cov = embedding_moments(df, vec_col=vec_col)
    vals, comps = pca_from_moments(mean, cov, k)
    return vals, comps, mean


def pca_project(
    df: DataFrame,
    comps,
    mean,
    *,
    id_col: str = "emb_id",
    vec_col: str = "vec",
) -> DataFrame:
    """Project onto a fitted (k, d) basis: ``Wᵀ(x − μ) = Wᵀx − Wᵀμ``
    emitted as ``k`` pure-Catalyst dot-product folds with literal
    coefficients — no Python in the transform, no shuffle at all.
    Output: ``(id, pc0..pc{k-1})``."""
    bias = comps @ mean
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    outs = []
    for i in range(len(comps)):
        w = F.array(*[F.lit(float(c)) for c in comps[i]])
        dot = F.aggregate(
            F.zip_with(x, w, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        outs.append((dot - F.lit(float(bias[i]))).alias(f"pc{i}"))
    return df.select(F.col(id_col), *outs)


def embedding_pca(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "emb_id",
    vec_col: str = "vec",
) -> DataFrame:
    """Project embeddings onto their top-``k`` principal components.

    Fit via :func:`fit_pca` (one partial-aggregation pass), then the
    projection ``Wᵀ(x − μ) = Wᵀx − Wᵀμ`` is emitted as ``k`` pure-
    Catalyst dot-product folds with literal coefficients — no Python in
    the transform, no shuffle at all. Output: ``(id, pc0..pc{k-1})``.
    """
    _vals, comps, mean = fit_pca(df, k, vec_col=vec_col)
    return pca_project(df, comps, mean, id_col=id_col, vec_col=vec_col)


def label_outliers(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n: int = 10,
    buckets: int = 32,
) -> DataFrame:
    """Per-label embedding outliers: the ``n`` vectors least similar
    (cosine) to their own label's centroid — the label-noise /
    mislabeled-example sweep a training-data pipeline runs before
    fitting anything on the labels.

    Everything runs in the exploded (row, dim) domain with components
    quantized to 6 decimals and carried as INT64 MICRO-UNITS
    (value·10⁶ — the same lattice DECIMAL(18,6) spans, in plain long
    arithmetic), so centroid sums, dot products, and norms are exact
    under any partitioning. Long µ-units replace the original
    DECIMAL(18,6) columns after an r9 profile showed JVM decimal
    multiply-aggregate costing ~2× plain long arithmetic (the per-row
    dot stage alone was 1.9 s of the 4.1 s total at the 10× tier);
    every published value is bit-identical — a sum of µ-units k cast
    to double then divided by 10⁶/10¹² equals the DECIMAL sum cast to
    double as long as |k| < 2⁵³ (both are the correctly-rounded double
    of the same exact rational; dot sums here are ≤ ~10¹⁴), and the
    oracle agrees byte-exactly in CI.

    1. centroid: one (label, dim)-keyed aggregate — output is
       labels x dim rows, broadcastable at ANY corpus size;
    2. per-row cosine-to-centroid: broadcast-join the centroid onto
       the exploded rows, one row-keyed aggregate. TWO alternatives
       were A/B'd at the 100x tier and REJECTED on measurement: an
       Arrow mapInPandas kernel (9.6 vs 4.7 s — joining a 64-long
       centroid array onto every row + np.vstack costs more than the
       long hash-aggregate, r9), and a pure-Catalyst zip_with/
       aggregate fold over one centroid-array row per label (12.3 vs
       5.3 s, r10 — higher-order-function lambdas evaluate INTERPRETED
       per element, ~400M invocations here, losing to the codegen'd
       exploded hash aggregate despite shipping less data). The
       exploded join+agg shape stands as the measured best;
    3. top-n per label runs TWO-PHASE (the cap_per_group shape): a
       window per (label, hash-bucket) prunes to local top-n — the
       global top-n is always a subset — then the exact window ranks
       the <= buckets*n survivors. A single label-partitioned window
       would serialize each label's millions of rows onto one reducer.

    Output: ``(label, id_col, cos_centroid, rank)`` with rank 1 = the
    most dissimilar vector (ties broken by id, deterministic).
    """
    from pyspark.sql import Window

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # quantize through DECIMAL(18,6) (exact HALF_UP at 6 decimals),
    # then to µ-units: decimal(18,6) · 10⁶ is an exact integer
    xm = (
        F.round(F.col("_x").cast("double"), 6).cast("decimal(18,6)")
        * F.lit(1000000)
    ).cast("long")
    # NO lineage cut here (r10): localCheckpoint materialized the
    # rows x dim frame (256 M rows at the 200x tier) in the block
    # manager on EVERY invocation and the blocks only free on GC —
    # repeated runs in one session degraded 5.9 -> 47 -> 89 s as
    # storage filled and spilled. Recomputing the explode+quantize
    # projection for the second consumer is a codegen'd map off a
    # column-pruned scan: measured FLAT 6.5-7.2 s/run at both 100x
    # and 200x (vs the leak), and at real scale re-reading the scan
    # beats materializing a corpus x dim frame that cannot fit.
    dims = emb.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_lab"),
        F.posexplode(vec_col).alias("_i", "_x"),
    ).select("_id", "_lab", "_i", xm.alias("_xm"))
    cent = dims.groupBy("_lab", "_i").agg(
        F.sum("_xm").alias("_sm"), F.count(F.lit(1)).alias("_cnt")
    ).select(
        "_lab",
        "_i",
        # mean back on the 6-decimal lattice: sum_µ → double (exact:
        # |sum| « 2⁵³) → /10⁶ (correctly rounded, = the DECIMAL-sum
        # cast) → /cnt → round → µ-units again
        (
            F.round(
                F.col("_sm").cast("double") / F.lit(1000000.0) / F.col("_cnt"),
                6,
            ).cast("decimal(18,6)")
            * F.lit(1000000)
        )
        .cast("long")
        .alias("_cm"),
    )
    cnorm = cent.groupBy("_lab").agg(
        F.sum(F.col("_cm") * F.col("_cm")).alias("_ncm")
    )
    joined = dims.join(F.broadcast(cent), ["_lab", "_i"])
    per_row = joined.groupBy("_id", "_lab").agg(
        F.sum(F.col("_xm") * F.col("_cm")).alias("_dotm"),
        F.sum(F.col("_xm") * F.col("_xm")).alias("_nvm"),
    )
    micro2 = F.lit(1.0e12)
    cos = (
        per_row.join(F.broadcast(cnorm), "_lab")
        .select(
            "_lab",
            "_id",
            (
                F.round(
                    (F.col("_dotm").cast("double") / micro2)
                    / (
                        F.sqrt(F.col("_nvm").cast("double") / micro2)
                        * F.sqrt(F.col("_ncm").cast("double") / micro2)
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("cos_centroid"),
        )
    )
    bucket = F.pmod(F.xxhash64(F.col("_id")), F.lit(buckets))
    pruned = (
        cos.withColumn("_b", bucket)
        .withColumn("_lr", F.row_number().over(
            Window.partitionBy("_lab", "_b").orderBy(
                F.col("cos_centroid").asc(), F.col("_id").asc()
            )
        ))
        .filter(F.col("_lr") <= n)
        .drop("_b", "_lr")
    )
    final = Window.partitionBy("_lab").orderBy(
        F.col("cos_centroid").asc(), F.col("_id").asc()
    )
    return (
        pruned.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= n)
        .select(
            F.col("_lab").alias(label_col),
            F.col("_id").alias(id_col),
            "cos_centroid",
            "rank",
        )
    )
