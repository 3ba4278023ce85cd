"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: pure Column expressions (zip_with + aggregate
  dot product) — the correctness baseline, one scan, no shuffle beyond the
  final top-k (orderBy + limit = distributed TakeOrdered, no full sort).
- LSH-bucketed near-neighbor pairs: random-hyperplane signatures computed
  by an Arrow-vectorized pandas UDF (one numpy matmul per batch), bucket
  join on signature bands, exact cosine verification of candidates — the
  scale path for all-pairs similarity (never materializes N^2).
- Exact all-pairs: blocked cogroup self-join (one BLAS matmul per
  unordered block pair, no driver collect, executor memory bounded by the
  block size) — the distributed shape for the inherently O(N^2) baseline.
- IVF-style search: k-means-lite coarse centroids (seeded sample, driver
  numpy) or deterministic row-centroids, probe nearest cells only — the
  scale path for query top-k; ivf_write/ivf_probe materialize the index
  cell-partitioned so probes prune partitions instead of recomputing
  assignments.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def pair_cosine_udf():
    """Arrow-vectorized cosine of two vector columns: one numpy batch op
    instead of the interpreted HOF lambda (which Catalyst evaluates per
    ELEMENT per row — measured ~50x slower on the pairs path)."""

    @pandas_udf("double")
    def _pair_cosine(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack([np.asarray(v, dtype=np.float64) for v in va.to_numpy()])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in vb.to_numpy()])
        num = (A * B).sum(axis=1)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / den)

    return _pair_cosine


def cosine_topk(
    df: DataFrame,
    query_vec: list,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    impl: str = "pandas",
) -> DataFrame:
    """Brute-force cosine top-k against a constant query vector.
    orderBy+limit compiles to TakeOrderedAndProject — each partition keeps
    its local top-k, driver merges; no global sort.

    ``impl='pandas'`` (default) computes similarities with one numpy
    matrix-vector product per Arrow batch; ``impl='expr'`` keeps the pure
    Column-expression form (no Python workers at all — useful where Arrow
    transfer is the bottleneck, but the HOF lambda is interpreted per
    element, so 'pandas' wins on wide vectors)."""
    if impl == "expr":
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        sim = cosine(F.col(vec_col).cast("array<double>"), q)
        return (
            df.select(F.col(id_col), F.round(sim, 4).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.col(id_col))
            .limit(k)
        )
    q = np.asarray(query_vec, dtype=np.float64)
    qnorm = np.linalg.norm(q)

    def block(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()]
            )
            # dot/(|a|*|q|), same association as the expr form
            sims = np.round((A @ q) / (np.linalg.norm(A, axis=1) * qnorm), 4)
            yield pd.DataFrame({id_col: pdf[id_col], "cos_sim": sims})

    id_type = df.schema[id_col].dataType.simpleString()
    return (
        df.select(id_col, vec_col)
        .mapInPandas(block, f"`{id_col}` {id_type}, cos_sim double")
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def cosine_pairs_exact(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int | None = None,
    rows_per_block: int = 8192,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold, fully distributed: the classic
    blocked self-join. Rows are hashed into ``n_blocks`` blocks; every
    unordered block pair (i <= j) becomes one cogroup task that runs a
    single BLAS matmul over its two blocks. No side is ever collected to
    the driver and no executor holds more than 2 * N / n_blocks vectors —
    size ``n_blocks`` so a block fits executor memory (compute stays
    O(N^2/2) because exact all-pairs is; lsh_cosine_pairs is the
    subquadratic path when a threshold-based candidate filter is
    acceptable). Each row is replicated n_blocks times into the shuffle,
    so more blocks than needed is pure overhead: the default sizes
    n_blocks from a count so each block holds ~``rows_per_block`` vectors
    (pass n_blocks explicitly to skip the count or to match executor
    memory at scale).

    Values are bit-comparable with the SQL oracle after round(4): both
    sides normalize then dot (one dgemm per block pair)."""
    if n_blocks is None:
        import math

        n_blocks = max(1, math.ceil(df.count() / rows_per_block))
    id_type = df.schema[id_col].dataType.simpleString()
    if id_type not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError(
            f"cosine_pairs_exact requires an integral id column (the "
            f"min/max pair orientation needs an ordered numeric id), got "
            f"{id_type}"
        )
    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).alias("v"),
        blk.alias("b"),
    )
    # every row fans out to each block pair it belongs to — as the LEFT
    # side of pairs (b, j >= b) and the RIGHT side of pairs (i <= b);
    # explode of a filtered literal array, no join, no shuffle until the
    # cogroup itself
    js = F.array(*[F.lit(j).cast("int") for j in range(n_blocks)])
    left = base.select(
        F.col("b").alias("bi"),
        F.explode(F.filter(js, lambda j: j >= F.col("b"))).alias("bj"),
        "id",
        "v",
    )
    # the right side renames id/v: both sides derive from `base`, so bare
    # "id"/"v" references would carry the SAME attribute ids on both
    # children — Catalyst's column pruning then satisfies the cogroup's
    # input requirement from the left child alone and prunes the right
    # child to its grouping keys whenever the UDF output itself is unused
    # (e.g. a count()-only plan), handing the UDF a keys-only frame
    right = base.select(
        F.explode(F.filter(js, lambda j: j <= F.col("b"))).alias("bi"),
        F.col("b").alias("bj"),
        F.col("id").alias("rid"),
        F.col("v").alias("rv"),
    )

    def block(key, lpdf, rpdf):
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        A = np.stack([np.asarray(v, dtype=np.float64) for v in lpdf["v"].to_numpy()])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in rpdf["rv"].to_numpy()])
        An = A / np.linalg.norm(A, axis=1, keepdims=True)
        Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
        sims = np.round(An @ Bn.T, 4)
        a_ids = lpdf["id"].to_numpy().astype(np.int64)
        b_ids = rpdf["rid"].to_numpy().astype(np.int64)
        mask = sims >= threshold
        if key[0] == key[1]:
            # diagonal block: both sides hold the same set — keep each
            # unordered pair once
            mask &= a_ids[:, None] < b_ids[None, :]
        ai, bi = np.nonzero(mask)
        ida, idb = a_ids[ai], b_ids[bi]
        # every unordered pair lives in exactly one block pair (blocks are
        # a partition of the ids), so orienting output as (min, max) here
        # needs no global distinct
        return pd.DataFrame(
            {
                "id_a": np.minimum(ida, idb),
                "id_b": np.maximum(ida, idb),
                "cos_sim": sims[ai, bi],
            }
        )

    return (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("bi", "bj"))
        .applyInPandas(block, "id_a long, id_b long, cos_sim double")
    )


def _pack_bits(bits: np.ndarray) -> pd.Series:
    sig = np.zeros(bits.shape[0], dtype=np.uint64)
    for b in range(bits.shape[1]):
        sig |= bits[:, b].astype(np.uint64) << np.uint64(b)
    return pd.Series(sig.astype(np.int64))


def _plane_udf(planes: np.ndarray):
    @pandas_udf("long")
    def signature(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim) float32
        proj = m.astype(np.float64) @ planes.T  # (batch, n_planes)
        return _pack_bits(proj > 0)

    return signature


def md5_rademacher_planes(n_planes: int, dim: int) -> np.ndarray:
    """±1 hyperplane matrix derived from md5 — the engine-portability
    contract for LSH: DuckDB reproduces the sign of (plane b, dim i) as
    ``CAST(concat('0x', substr(md5('p'||b||':'||i), 1, 15)) AS BIGINT) & 1``
    (1 -> +1, 0 -> -1). Rademacher projections are a standard drop-in for
    Gaussian hyperplanes in sign-LSH (Achlioptas-style sparse/±1 random
    projections preserve angles in expectation)."""
    import hashlib

    S = np.empty((n_planes, dim), dtype=np.int64)
    for b in range(n_planes):
        for i in range(dim):
            h = int(hashlib.md5(f"p{b}:{i}".encode()).hexdigest()[:15], 16)
            S[b, i] = 1 if (h & 1) else -1
    return S


def _plane_udf_md5q(planes: np.ndarray):
    """Signature via EXACT integer math so DuckDB agrees bit-for-bit:
    components quantized with floor(v * 2^20) (the float64 product of a
    float32 by a power of two is exact, so floor is deterministic in any
    engine), then an int64 matmul against the ±1 planes — projections are
    exact integers, and the >0 sign can never diverge by rounding order."""

    @pandas_udf("long")
    def signature(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        q = np.floor(m.astype(np.float64) * float(1 << 20)).astype(np.int64)
        proj = q @ planes.T  # exact int64
        return _pack_bits(proj > 0)

    return signature


def expected_recall(threshold: float, bands: int, bits_per_band: int) -> float:
    """Sign-LSH recall FLOOR for ``lsh_cosine_pairs``: the probability that
    a pair whose cosine is exactly ``threshold`` shares at least one band.

    Per-plane agreement for a pair at angle θ is p = 1 − θ/π (Goemans–
    Williamson / Charikar SimHash), a band of b bits collides with p^b, and
    any-of-``bands`` collision is 1 − (1 − p^b)^bands. Recall is monotone
    increasing in cosine, so pairs ABOVE the threshold are recalled at
    least this often — the value is the contract for the hardest reported
    pairs. Selectivity is the flip side: a random pair (cos ≈ 0, p = 1/2)
    collides per band with 2^−b, so bits_per_band must stay large enough
    that candidates ≈ bands · n²/2^b stays bounded (the 2-bit-band shape
    admitted ~every pair; see the embeddings_lsh_pairs docstring)."""
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    return 1.0 - (1.0 - p**bits_per_band) ** bands


def lsh_cosine_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    n_planes: int = 16,
    bands: int = 4,
    threshold: float = 0.9,
    seed: int = 42,
    plane_fn: str = "gauss",
    min_recall: float = 0.5,
    on_low_recall: str = "warn",
) -> DataFrame:
    """Near-duplicate embedding pairs: random-hyperplane LSH buckets ->
    candidate pairs -> exact cosine verify >= threshold.

    ``plane_fn='md5q'`` swaps the Gaussian hyperplanes for md5-derived ±1
    planes with integer-quantized projections (see md5_rademacher_planes /
    _plane_udf_md5q): every bucket bit is exact integer math DuckDB can
    replay, which makes the WHOLE operator — banding included —
    oracle-able. Default 'gauss' keeps the classic seeded Gaussian planes.

    RECALL CONTRACT: pairs at the threshold boundary are found with
    probability ``expected_recall(threshold, bands, n_planes // bands)``;
    when that floor is below ``min_recall`` the call warns (or raises with
    ``on_low_recall='raise'``; ``'ignore'`` silences) — low thresholds
    with selective banding silently drop most qualifying pairs, which is
    a fine exploration trade but a terrible silent default. At production
    near-dup thresholds (>= 0.85) the default 8-bit bands recall >= 90%."""
    if on_low_recall not in ("warn", "raise", "ignore"):
        raise ValueError(f"on_low_recall: {on_low_recall!r}")
    floor = expected_recall(threshold, bands, n_planes // bands)
    if floor < min_recall and on_low_recall != "ignore":
        msg = (
            f"lsh_cosine_pairs: expected recall at threshold {threshold} "
            f"with {bands} bands x {n_planes // bands} bits is only "
            f"{floor:.3f} (< min_recall={min_recall}); pairs near the "
            "threshold will mostly be missed. Raise the threshold, use "
            "more/narrower bands (recall rises, selectivity falls), or "
            "pass on_low_recall='ignore' to accept the trade."
        )
        if on_low_recall == "raise":
            raise ValueError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    if plane_fn == "md5q":
        sig = _plane_udf_md5q(md5_rademacher_planes(n_planes, dim))
    else:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((n_planes, dim))
        sig = _plane_udf(planes)
    rows_per_band = n_planes // bands
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn(
        "sig", sig(F.col("v"))
    )
    mask = (1 << rows_per_band) - 1
    buckets = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * rows_per_band)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.val")
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "val"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    vecs = base.select("id", "v")
    va = vecs.withColumnRenamed("id", "id_a").withColumnRenamed("v", "v_a")
    vb = vecs.withColumnRenamed("id", "id_b").withColumnRenamed("v", "v_b")
    # exact verify with the Arrow-vectorized pair cosine (one numpy batch op)
    # rather than the interpreted HOF lambda — same values after round(4),
    # measured ~50x faster on candidate sets (see cosine_pairs_exact)
    sim = pair_cosine_udf()(F.col("v_a"), F.col("v_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos_sim", F.round(sim, 4))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def _coarse_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_cells: int,
    seed: int,
    sample_rows: int,
    centroid_ids: list | None,
) -> np.ndarray:
    """Coarse IVF centroids: deterministic table rows (``centroid_ids``,
    sorted — index order == id order, the tie-break an external engine can
    replay) or k-means-lite on a bounded seeded sample."""
    if centroid_ids is not None:
        rows = (
            df.filter(F.col(id_col).isin(list(centroid_ids)))
            .select(id_col, vec_col)
            .collect()
        )
        rows.sort(key=lambda r: r[0])
        return np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    sample = np.stack(
        [r[0] for r in df.select(vec_col).limit(sample_rows).collect()]
    ).astype(np.float64)
    rng = np.random.default_rng(seed)
    cents = sample[
        rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)
    ]
    for _ in range(5):  # lite Lloyd iterations on the sample
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cents)):
            pts = sample[assign == c]
            if len(pts):
                cents[c] = pts.mean(0)
    return cents


def ivf_topk(
    df: DataFrame,
    query_vec: list,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    sample_rows: int = 4096,
    impl: str = "pandas",
    centroid_ids: list | None = None,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF-flat approximate top-k, recompute form: coarse centroids from a
    seeded sample (driver numpy k-means-lite), rows assigned to nearest
    cell in the same pass that scores them. The 100 TB shape is the
    MATERIALIZED twin — ivf_write persists assignments hive-partitioned by
    cell and ivf_probe prunes non-probed partitions at the scan
    (plan-asserted); both return identical results for the same centroids.

    ``n_probe >= n_cells`` probes every cell, making the result EXACTLY the
    brute-force top-k — the driver's `embeddings_ivf_exact` query oracles
    the whole cell-assign/probe machinery against plain SQL that way.

    ``impl='pandas'`` (default) does cell assignment + scoring in one
    mapInPandas pass — one (batch x cells) distance matrix and one
    matrix-vector product per Arrow batch. ``impl='expr'`` keeps the pure
    Column form (no Python workers), whose HOF lambdas Catalyst interprets
    per element per centroid — O(cells*dim) interpreter calls per row.

    ``centroid_ids`` (sorted list of row ids) picks the centroids
    DETERMINISTICALLY as those rows' vectors (no sample, no Lloyd) —
    engine-portable, so an external SQL engine can replay the whole
    approximate cell-assign/probe/score pipeline (the driver's
    embeddings_ivf_topk oracle does exactly that); centroid quality is a
    recall concern, not a correctness one — quantify it with
    ``ivf_measured_recall`` before fixing ``n_probe`` for an index.

    ``centroids`` (a prebuilt ``(cells, dim)`` array) skips centroid
    construction entirely — pass ivf_write's persisted ``_ivf_centroids``
    or share one build across many queries (ivf_measured_recall does)."""
    cents = (
        np.asarray(centroids, dtype=np.float64)
        if centroids is not None
        else _coarse_centroids(
            df, vec_col, id_col, n_cells, seed, sample_rows, centroid_ids
        )
    )

    q = np.asarray(query_vec, dtype=np.float64)
    qd = ((cents - q[None, :]) ** 2).sum(1)
    probe_cells = [int(c) for c in qd.argsort()[:n_probe]]

    if impl == "expr":
        cent_arrs = [F.array(*[F.lit(float(x)) for x in c]) for c in cents]
        v = F.col(vec_col).cast("array<double>")
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(v, ca, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda a, b: a + b,
                )
                for ca in cent_arrs
            ]
        )
        cell = F.array_position(dists, F.array_min(dists)) - 1
        qcol = F.array(*[F.lit(float(x)) for x in query_vec])
        sim = cosine(v, qcol)
        return (
            df.withColumn("_cell", cell)
            .filter(F.col("_cell").isin(probe_cells))
            .select(F.col(id_col), F.round(sim, 4).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.col(id_col))
            .limit(k)
        )

    C = cents  # (cells, dim); same full (a-c)^2 sum as the expr form so
    # argmin ties resolve identically (first minimum) across impls
    probe = np.asarray(probe_cells, dtype=np.int64)
    qnorm = np.linalg.norm(q)

    def block(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()]
            )
            cell = ((A[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
            m = np.isin(cell, probe)
            if not m.any():
                continue
            Am = A[m]
            sims = np.round((Am @ q) / (np.linalg.norm(Am, axis=1) * qnorm), 4)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy()[m], "cos_sim": sims}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return (
        df.select(id_col, vec_col)
        .mapInPandas(block, f"`{id_col}` {id_type}, cos_sim double")
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def ivf_measured_recall(
    df: DataFrame,
    query_vecs: list,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    sample_rows: int = 4096,
    centroid_ids: list | None = None,
) -> dict:
    """Measured recall@k of IVF at ``n_probe`` probes vs the exact top-k —
    the IVF counterpart of the sign-LSH families' ``expected_recall``
    contract. Unlike sign-LSH, IVF has NO distribution-free closed form:
    a pair's survival depends on whether the query's true neighbours live
    in its ``n_probe`` nearest cells, which is a property of how the data
    clusters. So the contract is empirical: recall@k = |IVF∩exact| / k,
    averaged over a representative query sample. The trade it quantifies
    is scan cost — a probe reads ~``n_probe / n_cells`` of the index
    (ivf_probe prunes the rest at the partition level) — against the
    fraction of true neighbours outside the probed cells.

    Centroids are built ONCE (same seeded k-means-lite / centroid_ids path
    as ivf_topk) and shared across both sides of every query, so the
    comparison isolates n_probe; the exact side is ``n_probe = n_cells``
    (full probe == brute force, the equality ivf_topk's docstring pins).
    Cost: 2 x len(query_vecs) Spark jobs — a diagnostic to run on a sample
    before fixing ``n_probe`` for a production index, not a hot-path op."""
    cents = _coarse_centroids(
        df, vec_col, id_col, n_cells, seed, sample_rows, centroid_ids
    )
    per_query = []
    for qv in query_vecs:
        exact = {
            r[0]
            for r in ivf_topk(
                df, qv, k=k, vec_col=vec_col, id_col=id_col,
                n_probe=len(cents), centroids=cents,
            ).collect()
        }
        got = {
            r[0]
            for r in ivf_topk(
                df, qv, k=k, vec_col=vec_col, id_col=id_col,
                n_probe=n_probe, centroids=cents,
            ).collect()
        }
        per_query.append(len(exact & got) / float(max(len(exact), 1)))
    return {
        "k": k,
        "n_cells": int(len(cents)),
        "n_probe": n_probe,
        "scan_fraction": n_probe / float(len(cents)),
        "n_queries": len(per_query),
        "recall_per_query": per_query,
        "mean_recall": sum(per_query) / max(len(per_query), 1),
        "min_recall": min(per_query) if per_query else 0.0,
    }


def ivf_write(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    seed: int = 42,
    sample_rows: int = 4096,
    centroid_ids: list | None = None,
) -> np.ndarray:
    """Materialize the IVF index — the 100 TB shape ivf_topk's docstring
    promises: cell assignment computed ONCE (one mapInPandas pass, one
    (batch x cells) distance matrix per Arrow batch) and written
    hive-partitioned by cell, centroids stored next to the data
    (underscore-prefixed file, invisible to parquet readers). Probes then
    prune whole partitions instead of recomputing assignments per query.
    Returns the centroid matrix."""
    import json
    import os

    cents = _coarse_centroids(
        df, vec_col, id_col, n_cells, seed, sample_rows, centroid_ids
    )
    C = cents

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()]
            )
            out = pdf.copy()
            # same full (a-c)^2 sum + first-min tie-break as ivf_topk
            out["cell"] = ((A[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
            yield out

    id_type = df.schema[id_col].dataType.simpleString()
    vec_type = df.schema[vec_col].dataType.simpleString()
    assigned = df.select(id_col, vec_col).mapInPandas(
        assign, f"`{id_col}` {id_type}, `{vec_col}` {vec_type}, cell int"
    )
    assigned.write.partitionBy("cell").mode("overwrite").parquet(path)
    with open(os.path.join(path, "_ivf_centroids.json"), "w") as f:
        json.dump(cents.tolist(), f)
    return cents


def ivf_probe(
    spark,
    path: str,
    query_vec: list,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Query a materialized IVF index: the n_probe nearest cells are
    picked on the driver (O(cells) math), and the ``cell`` filter is a
    PARTITION filter — Catalyst prunes the non-probed directories at
    planning time, so the scan reads n_probe/n_cells of the data
    (plan-asserted in tests/test_plans.py). Scoring is the same batched
    BLAS matvec as ivf_topk; results are identical to recomputing
    assignments with the same centroids."""
    import json
    import os

    with open(os.path.join(path, "_ivf_centroids.json")) as f:
        cents = np.asarray(json.load(f), dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    qd = ((cents - q[None, :]) ** 2).sum(1)
    probe_cells = [int(c) for c in qd.argsort()[:n_probe]]
    qnorm = np.linalg.norm(q)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()]
            )
            sims = np.round((A @ q) / (np.linalg.norm(A, axis=1) * qnorm), 4)
            yield pd.DataFrame({id_col: pdf[id_col], "cos_sim": sims})

    df = spark.read.parquet(path).filter(F.col("cell").isin(probe_cells))
    id_type = df.schema[id_col].dataType.simpleString()
    return (
        df.select(id_col, vec_col)
        .mapInPandas(score, f"`{id_col}` {id_type}, cos_sim double")
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )
