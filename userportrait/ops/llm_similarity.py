"""§2.K (similarity half) — embedding similarity search over ``embeddings``.

EXT ops mandated by BASELINE.json:6. The naive Spark shape (higher-order-fn
dot product inside a crossJoin) costs 27.2 s at sf0.1 (BASELINE.md:26);
these ops use the blocked broadcast-index pattern instead: the index streams
through in bounded vec_id-range chunks (``_index_chunks``), each chunk
normalized into a numpy float64 matrix and broadcast, and each partition of
query vectors computes a blocked matrix product via ``mapInPandas`` (Arrow
batches, no per-row Python); per-chunk partial results merge exactly
(top-k re-rank / threshold union). That is the classic
brute-force-but-blocked exact baseline with O(chunk) memory at any scale —
compute is still O(n²), which is why the 100 TB ANN paths are
``sim_knn_lsh`` / ``sim_knn_ivf`` (band signatures → bucket join → exact
rescore, the candidate machinery built for ``dedup_near_minhash``).

Determinism: all math in float64; similarities rounded to 4dp Spark-side
(F.round, same policy as fn_math); ties broken by neighbor id ascending in
both engines. The index matrix is sorted by vec_id so numpy's stable
argsort yields the id-asc tie-break for free.

Threshold note: SURVEY §2.K specs ``cosine >= 0.8`` but the driver's
embeddings are near-orthogonal random vectors — max pairwise cosine is 0.51
at sf0.01 / 0.60 at sf0.1, so 0.8 selects the empty set at every SF. The
threshold here is 0.45 (≈10 pairs at sf0.01), which actually exercises the
op; the nearest observed cosine is >5e-3 away from the cut, far beyond any
cross-engine ulp wobble.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from functools import reduce
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import embed_partitions, load, pin
from ..registry import op

K_NEIGHBORS = 5
SIM_THRESHOLD = 0.45

_ORACLE_SIMS_CTE = """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
    ), sims AS (
      SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
             list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) / (a.nrm * b.nrm) AS sim
      FROM n a JOIN n b ON a.vec_id <> b.vec_id
    )
"""


# Blocked-index sizing. Exact kNN is inherently O(n²) compute, but MEMORY
# must stay O(chunk): the index is never collected or broadcast whole. Rows
# per chunk = min(CAP, total_rows) — the chunk COUNT is purely what the
# memory bound forces, never more:
#   - CAP is the per-broadcast memory bound (500k rows × dim 64 f64 ≈
#     256 MB per broadcast — a deploy-safe default that torrent-broadcasts
#     cleanly; a 1e9-vector corpus then runs 2000 bounded chunks — more
#     jobs, never more memory. Raise via env on clusters with headroom);
#   - below CAP the whole index is ONE chunk. The r13 form aimed for ~8
#     chunks (a TARGET_CHUNKS divisor) regardless of size, which bought
#     nothing — every chunk under CAP already satisfies the memory bound,
#     and each extra chunk costs a quantile cut, a collect job, a
#     broadcast, a full query-side pass and a checkpoint barrier (r14
#     measurement: the 10× replica's 20k-vector/10 MB index ran FIVE
#     chunk rounds, q_vector_knn 11.5 s → 4.6 s as one chunk);
#   - MIN guards the forced-low test configurations from degenerating
#     into per-row jobs (in the default config it is inert: min(CAP, n)
#     is either n — one chunk — or CAP ≫ MIN).
# tests/test_invariants.py forces MIN=CAP low to stress many chunks, so the
# multi-chunk merge path stays exercised regardless of these defaults.
INDEX_CHUNK_MIN = int(os.environ.get("UP_KNN_CHUNK_MIN", "4096"))
INDEX_CHUNK_CAP = int(os.environ.get("UP_KNN_CHUNK_CAP", "500000"))
# Per-task transient bound: the kernel's sims matrix is (query rows ×
# chunk rows) f64 — batch × 500k-chunk would be ~40 GB/task if computed
# whole (observed: python workers OOM-killed at the 100× replica). Query
# rows are independent for both emit kernels (per-row top-k / per-row
# threshold), so the matmul runs in row tiles of <= TILE_ELEMS sims
# elements (~128 MB at the default) — EXACT, no merge step needed.
KNN_TILE_ELEMS = int(os.environ.get("UP_KNN_TILE_ELEMS", "16000000"))


def _index_chunks(spark: SparkSession, sf_dir: str):
    """Yield the normalized float64 index as bounded (ids, mat) chunks,
    each sorted by vec_id.

    Chunk boundaries are approximate QUANTILES of vec_id, so chunk COUNT
    scales with row count (ceil(rows / chunk_rows)) and never with id-space
    width — a sparse 64-bit id space (snowflake ids, hash ids) yields the
    same handful of chunks as a dense one, where fixed-width id ranges
    would degenerate into billions of near-empty scan jobs. Each collect
    is a vec_id range predicate that pushes into the parquet scan (each
    chunk reads only its stripe — no whole-table ``toPandas`` ever
    happens); rows per chunk ≈ target ± the quantile error (bounded at 5%
    of a chunk). Driver + broadcast memory is O(chunk × dim) at any
    instant; this removes the last index-fits-in-one-broadcast assumption
    in the §2.K family (VERDICT r5 "What's wrong" #1)."""
    import numpy as np

    emb = load(spark, sf_dir).embeddings.select("vec_id", "embedding")
    total, lo, hi = emb.agg(F.count("*"), F.min("vec_id"), F.max("vec_id")).first()
    if lo is None:
        return
    target = max(INDEX_CHUNK_MIN, min(INDEX_CHUNK_CAP, total))
    n_chunks = max(1, -(-total // target))
    if n_chunks == 1:
        cuts: list[int] = []
    else:
        # rank error <= 5% of one chunk up to ~500 chunks; past that the
        # 1e-4 floor (which caps approxQuantile's GK-sketch cost) takes
        # over and the per-chunk size error grows toward eps*total rows —
        # at the 2000-chunk/1e9-vector extreme that is ~20% of a chunk, so
        # the effective per-broadcast bound is CAP*1.2, not CAP. Size CAP
        # with that headroom (the 256 MB default leaves it) or lower the
        # floor on clusters where a costlier quantile pass is acceptable.
        eps = max(1e-4, 0.05 / n_chunks)
        qs = emb.stat.approxQuantile(
            "vec_id", [i / n_chunks for i in range(1, n_chunks)], eps
        )
        # dedupe + keep strictly increasing interior boundaries
        cuts = sorted({int(q) for q in qs if lo < int(q) <= hi})
    bounds = [lo, *cuts, hi + 1]
    for start, end in zip(bounds, bounds[1:]):
        pdf = (
            emb.where((F.col("vec_id") >= start) & (F.col("vec_id") < end))
            .toPandas()
            .sort_values("vec_id", ignore_index=True)
        )
        if len(pdf) == 0:
            continue
        ids = pdf["vec_id"].to_numpy(np.int64)
        mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        yield ids, mat


def _topk_cols_exact(np, sims, k, cand_width=64):
    """Per-row column indices of the k largest sims with ties broken by
    LOWER column index — exactly ``np.argsort(-sims, axis=1,
    kind="stable")[:, :k]`` — computed via an O(width) argpartition over
    a bounded candidate set instead of the full-width O(w log w) stable
    sort (r14, guide §1.2 per-task work: the full sort plus its ``-sims``
    negation copy were ~3.1 s of each 10×-replica kNN task where the
    partition path is ~0.7 s). The partition keeps the LARGEST ``c``
    columns directly on ``sims`` (no negated copy); sorting the candidate
    indices ascending before the small stable sort reproduces the
    lower-column tie-break. Exactness guard: a row whose candidate-set
    minimum ties its k-th value may have further ties beyond the
    candidate horizon and falls back to the full stable sort — so the
    result is bit-identical on every input, duplicates included."""
    n, w = sims.shape
    k = min(k, w)
    c = min(max(cand_width, k), w)
    if c >= w:
        return np.argsort(-sims, axis=1, kind="stable")[:, :k]
    part = np.argpartition(sims, w - c, axis=1)[:, w - c :]
    part.sort(axis=1)
    vals = np.take_along_axis(sims, part, axis=1)
    order = np.argsort(-vals, axis=1, kind="stable")[:, :k]
    top = np.take_along_axis(part, order, axis=1)
    kthv = np.take_along_axis(vals, order[:, k - 1 : k], axis=1)[:, 0]
    unsafe = vals.min(axis=1) >= kthv
    if unsafe.any():
        top[unsafe] = np.argsort(-sims[unsafe], axis=1, kind="stable")[:, :k]
    return top


def _mask_self_inplace(np, qids, aids, sims):
    """Set sims[r, j] = -inf where qids[r] == aids[j], in place. aids is
    ascending (chunks are vec_id-sorted), so the self column is ONE
    searchsorted lookup per row — the r13 form materialized an
    O(rows × chunk) boolean outer-equality and an equally sized
    ``np.where`` copy per tile (~0.55 s of each 10×-replica task)."""
    pos = np.searchsorted(aids, qids)
    inb = pos < len(aids)
    hit = np.nonzero(inb & (aids[np.minimum(pos, len(aids) - 1)] == qids))[0]
    sims[hit, pos[hit]] = -np.inf


def _query_batches(bc, fn):
    """mapInPandas kernel: per Arrow batch, normalize queries, one blocked
    matmul against the broadcast index, then delegate row emission to fn.
    Callers repartition the query side first — a single-file scan is one
    partition, which would serialize the whole matmul into one worker."""
    import numpy as np
    import pandas as pd

    # driver-side so tests can pin it; the closure ships the resolved int
    rows_per_tile = max(1, KNN_TILE_ELEMS // max(1, len(bc.value[0])))

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        aids, amat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qids = pdf["vec_id"].to_numpy(np.int64)
            qmat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
            for lo in range(0, len(qids), rows_per_tile):
                sims = qmat[lo : lo + rows_per_tile] @ amat.T  # (tile × chunk)
                yield fn(np, pd, qids[lo : lo + rows_per_tile], aids, sims)

    return gen


def _blocked_result(spark: SparkSession, sf_dir: str, emit, schema: str) -> DataFrame:
    """Run the blocked broadcast-index kernel with O(one chunk) memory at
    any INSTANT, not just per broadcast: chunks are processed SEQUENTIALLY —
    broadcast one chunk, materialize its bounded partial (``pin`` →
    local/reliable checkpoint), then ``destroy()`` the broadcast before
    fetching the next. Only the small materialized partials (≤ k rows per
    query, or the above-threshold pairs) survive to the final union, so
    neither driver temp files nor executor broadcast storage ever hold more
    than one chunk — at the 2000-chunk scale of a 1e9-vector corpus the
    eager form (every chunk broadcast alive through one union job, ADVICE
    r6) would have re-materialized the entire index.

    The query side is shuffled ONCE and persisted across chunks (one task
    wave per chunk, width = the session's shuffle parallelism —
    cores-matched locally, cluster-sized in deployment; re-shuffling per
    chunk was the second r6 finding), then unpersisted before returning —
    the pinned partials no longer reference it."""
    from itertools import chain

    from pyspark.storagelevel import StorageLevel

    chunks = _index_chunks(spark, sf_dir)
    first = next(chunks, None)
    if first is None:  # empty embeddings table -> empty result, same schema
        return spark.createDataFrame([], schema)
    second = next(chunks, None)
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = load(spark, sf_dir).embeddings.select("vec_id", "embedding")
    if second is None:
        # SINGLE-chunk fast path (r14): the pin/destroy discipline exists
        # so chunk N's broadcast can be freed before chunk N+1 loads —
        # with one chunk there is nothing to free early, so the partial
        # needs no checkpoint materialization (one localCheckpoint job +
        # block write + re-read per run at sf0.1, ~0.5 s) and the query
        # side needs no cross-chunk persist. The broadcast stays alive
        # with the returned plan and is reaped by the ContextCleaner.
        # Multi-chunk corpora (any real deployment) keep the sequential
        # O(one chunk) discipline below.
        bc = spark.sparkContext.broadcast(first)
        out = base.repartition(width, "vec_id").mapInPandas(_query_batches(bc, emit), schema)
        # flag for per-query-top-k consumers: ONE chunk means each query's
        # per-chunk winners ARE the global winners, so the cross-chunk
        # merge window (an exchange + sort over the result) is an identity
        # they can skip (r14, guide §2.4 — an orderBy used only to re-rank
        # rows already exactly ranked).
        out._up_single_chunk = True
        return out
    q = base.repartition(width, "vec_id").persist(StorageLevel.MEMORY_AND_DISK)
    partials: list[DataFrame] = []
    try:
        for chunk in chain([first, second], chunks):
            bc = spark.sparkContext.broadcast(chunk)
            try:
                partials.append(pin(q.mapInPandas(_query_batches(bc, emit), schema)))
            finally:
                bc.destroy()
    finally:
        q.unpersist()
    return reduce(DataFrame.unionAll, partials)


@op(
    "sim_cosine_knn",
    oracle=_ORACLE_SIMS_CTE
    + """
    , ranked AS (
      SELECT vec_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS rn
      FROM sims
    )
    SELECT vec_id, neighbor_id, round(sim, 4) AS sim FROM ranked WHERE rn <= 5
    """,
)
def sim_cosine_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors per vector (self excluded), BLOCKED
    broadcast-index matmul — the optimization target flagged in
    BASELINE.md:26 (naive crossJoin form: 27.2 s at sf0.1).

    The index streams through in bounded vec_id-range chunks
    (``_index_chunks``): each chunk is broadcast, every query partition
    takes its per-chunk top-5, and a final window re-ranks the union to the
    global exact top-5. Per-chunk top-5 dominates, so the merge is exact.
    Memory is O(chunk) everywhere — compute stays the unavoidable O(n²) of
    exact kNN, which is why sim_knn_lsh / sim_knn_ivf are the 100 TB paths.

    Determinism across chunk sizes: sims are deterministic f64 dot products,
    so equal values are bitwise-equal in any chunking; the final ordering
    (sim desc, neighbor_id asc) is therefore chunk-invariant, matching the
    single-matrix stable-argsort tie-break exactly
    (tests/test_invariants.py::test_knn_chunked_matches_single_chunk)."""

    def emit(np, pd, qids, aids, sims):
        _mask_self_inplace(np, qids, aids, sims)
        # == stable argsort on -sim over the id-ascending index (tie: id asc)
        top = _topk_cols_exact(np, sims, K_NEIGHBORS)
        rows = np.arange(len(qids))[:, None]
        keep = np.isfinite(sims[rows, top])  # drop self rows (chunk may be tiny)
        return pd.DataFrame(
            {
                "vec_id": np.repeat(qids, top.shape[1])[keep.ravel()],
                "neighbor_id": aids[top].ravel()[keep.ravel()],
                "sim": sims[rows, top].ravel()[keep.ravel()],
            }
        )

    union = _blocked_result(spark, sf_dir, emit, "vec_id bigint, neighbor_id bigint, sim double")
    if getattr(union, "_up_single_chunk", False):
        # one chunk: emit's per-query top-5 is already the exact global
        # top-5 — the merge window would re-rank identical rows through an
        # exchange + sort for nothing
        return union.select("vec_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        union.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= K_NEIGHBORS)
        .select("vec_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


@op(
    "sim_threshold_pairs",
    oracle=_ORACLE_SIMS_CTE
    + """
    SELECT vec_id AS vec_a, neighbor_id AS vec_b, round(sim, 4) AS sim
    FROM sims WHERE vec_id < neighbor_id AND sim >= 0.45
    """,
)
def sim_threshold_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All vector pairs with cosine >= 0.45 (a < b). Same blocked-chunk
    kernel as sim_cosine_knn; per-chunk above-threshold emission needs no
    re-rank — pairs partition cleanly across index chunks, so the union of
    chunk outputs IS the global answer."""

    def emit(np, pd, qids, aids, sims):
        keep = (qids[:, None] < aids[None, :]) & (sims >= SIM_THRESHOLD)
        qi, ai = np.nonzero(keep)
        return pd.DataFrame(
            {"vec_a": qids[qi], "vec_b": aids[ai], "sim": sims[qi, ai]}
        )

    out = _blocked_result(spark, sf_dir, emit, "vec_a bigint, vec_b bigint, sim double")
    return out.select("vec_a", "vec_b", F.round("sim", 4).alias("sim"))


@op(
    "embed_label_centroid",
    oracle="""
    WITH x AS (
      SELECT label, p.pos, CAST(embedding[p.pos] AS DOUBLE) AS val
      FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) p
    ), m AS (
      SELECT label, pos,
             CAST(CAST(CAST(sum(CAST(val AS DECIMAL(38,8))) AS DOUBLE) / count(*) AS VARCHAR) AS DOUBLE) AS mean_val
      FROM x GROUP BY label, pos
    )
    SELECT label,
           array_to_string(list(CAST(round(mean_val * 1000000) AS BIGINT) ORDER BY pos), ',') AS centroid
    FROM m GROUP BY label
    """,
)
def embed_label_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean vector per label: posexplode → (label, pos) decimal
    sum (exact, order-independent — SURVEY §2.0 rule 1) → one double division
    → re-assembled position-sorted. Two map-side-combinable shuffles, both on
    well-distributed keys; never collects a vector to the driver."""
    e = load(spark, sf_dir).embeddings
    exploded = e.select("label", F.posexplode("embedding").alias("pos", "val")).select(
        "label", "pos", F.col("val").cast("double").alias("val")
    )
    means = exploded.groupBy("label", "pos").agg(
        (F.sum(F.col("val").cast("decimal(38,8)")).cast("double") / F.count("*"))
        .cast("double")
        .alias("mean_val")
    )
    # Emitted as a comma-joined micro-unit (1e6) integer string: the driver's
    # pandas canonicalizer cannot hash list cells, and integer text is
    # formatting-identical across engines (double text repr is not).
    return (
        means.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mean_val"))).alias("pairs"))
        .select(
            "label",
            F.array_join(
                F.transform("pairs", lambda p: F.round(p.mean_val * 1000000).cast("bigint").cast("string")), ","
            ).alias("centroid"),
        )
    )


@op(
    "embed_norm_stats",
    oracle="""
    WITH n AS (
      SELECT label,
             round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS nrm
      FROM embeddings
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           min(nrm) AS min_norm,
           max(nrm) AS max_norm,
           CAST(CAST(CAST(sum(CAST(nrm AS DECIMAL(38,4))) AS DOUBLE) / count(*) AS VARCHAR) AS DOUBLE) AS avg_norm
    FROM n GROUP BY label
    """,
)
def embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm per vector (4dp) then min/max/decimal-avg per label — all
    higher-order array functions, JVM-side, no explode needed for the norm."""
    e = load(spark, sf_dir).embeddings
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    nrm = F.round(
        F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)), 4
    )
    return (
        e.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
            (F.sum(F.col("nrm").cast("decimal(38,4)")).cast("double") / F.count("*"))
            .cast("double")
            .alias("avg_norm"),
        )
    )


# ---------------------------------------------------------------------------
# Round-2 extension: the LSH-bucketed ANN scale path. sim_cosine_knn's
# broadcast index assumes the index side fits one broadcast; these ops are
# the shape that survives when it doesn't — signs of random-hyperplane
# projections bucket the vectors, candidates come from bucket joins, and
# the exact cosine runs only on candidates. The hyperplane family is
# md5-derived (w(j,d) = hexpair(md5(j||'_'||d)) - 127.5) so both engines
# build bit-identical planes and even the *approximation* is EXACT-oracled.
# The candidate machinery is parametrized on (tables, bits, cap, predicate)
# and shared between sim_knn_lsh and dedup_embed_cosine.
# ---------------------------------------------------------------------------

LSH_TABLES = 4
LSH_BITS = 6  # per table → 64 buckets/table
LSH_BUCKET_CAP = 32
# dedup wants recall at sim≈0.45 (p_collide/bit ≈ 0.65): fewer bits per
# table, more tables → 1-(1-0.65^3)^8 ≈ 0.92 pair recall, still 8 buckets
# per table of hot-bucket control. Same 24-projection md5 family, regrouped.
DEDUP_LSH_TABLES = 8
DEDUP_LSH_BITS = 3


def _lsh_cand_cte(tables: int, bits: int, cap: int, pair_pred: str) -> str:
    """DuckDB CTE chain ending in ``cand(vec_id, neighbor_id)`` — the exact
    mirror of ``_lsh_candidates`` below, parametrized identically."""
    nproj = tables * bits
    return f"""
    WITH w AS (
      SELECT j.j, d.d,
             CAST((strpos('0123456789abcdef', substring(md5(CAST(j.j AS VARCHAR) || '_' || CAST(d.d AS VARCHAR)), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substring(md5(CAST(j.j AS VARCHAR) || '_' || CAST(d.d AS VARCHAR)), 2, 1)) - 1)
                - 127.5 AS DOUBLE) AS wt
      FROM (SELECT unnest(generate_series(1, {nproj})) AS j) j
      CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS d) d
    ), elems AS (
      SELECT vec_id, p.pos - 1 AS d, CAST(embedding[p.pos] AS DOUBLE) AS val
      FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) p
    ), proj AS (
      SELECT e.vec_id, w.j, sum(CAST(e.val * w.wt AS DECIMAL(38,8))) AS s
      FROM elems e JOIN w ON e.d = w.d
      GROUP BY e.vec_id, w.j
    ), buckets AS (
      SELECT vec_id, (j - 1) // {bits} AS t,
             CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << ((j - 1) % {bits}) ELSE 0 END) AS BIGINT) AS bucket
      FROM proj GROUP BY vec_id, (j - 1) // {bits}
    ), capped AS (
      SELECT t, bucket, vec_id FROM (
        SELECT t, bucket, vec_id,
               row_number() OVER (PARTITION BY t, bucket ORDER BY vec_id) AS rn
        FROM buckets
      ) WHERE rn <= {cap}
    ), cand AS (
      SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS neighbor_id
      FROM buckets a JOIN capped b
        ON a.t = b.t AND a.bucket = b.bucket AND {pair_pred}
    )"""


def _lsh_candidates(
    spark: SparkSession, e: DataFrame, tables: int, bits: int, cap: int, dominators_only: bool
) -> DataFrame:
    """Banded-LSH candidate pairs (vec_id, neighbor_id), hash-join shape.

    ``dominators_only`` keeps only neighbor_id < vec_id (the min-id-survivor
    dedup predicate); otherwise all distinct-id pairs. The index side of each
    (table, bucket) is capped at its ``cap`` lowest vec_ids — bounded fan-out
    under degenerate buckets; for dedup the lowest ids are exactly the likely
    dominators, so the cap spends its budget where survival is decided."""
    from pyspark.sql import Window

    nproj = tables * bits
    one = spark.range(1)
    weights = (
        one.select(F.explode(F.sequence(F.lit(1), F.lit(nproj))).alias("j"))
        .select("j", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("d"))
        .withColumn(
            "wt",
            F.expr(
                "cast((instr('0123456789abcdef', substring(md5(concat(cast(j as string), '_', cast(d as string))), 1, 1)) - 1) * 16"
                " + (instr('0123456789abcdef', substring(md5(concat(cast(j as string), '_', cast(d as string))), 2, 1)) - 1)"
                " - 127.5 as double)"
            ),
        )
    )
    elems = e.select("vec_id", F.posexplode("embedding").alias("d", "val")).select(
        "vec_id", "d", F.col("val").cast("double").alias("val")
    )
    proj = (
        elems.join(F.broadcast(weights), "d")
        .groupBy("vec_id", "j")
        .agg(F.sum((F.col("val") * F.col("wt")).cast("decimal(38,8)")).alias("s"))
    )
    buckets = (
        proj.select(
            "vec_id",
            ((F.col("j") - 1) / bits).cast("int").alias("t"),
            F.when(F.col("s") > 0, F.expr(f"shiftleft(cast(1 as bigint), (j - 1) % {bits})"))
            .otherwise(F.lit(0))
            .alias("bit"),
        )
        .groupBy("vec_id", "t")
        .agg(F.sum("bit").cast("bigint").alias("bucket"))
    )
    wb = Window.partitionBy("t", "bucket").orderBy("vec_id")
    capped = buckets.withColumn("rn", F.row_number().over(wb)).where(F.col("rn") <= cap).drop("rn")
    a, b = buckets.alias("a"), capped.alias("b")
    pred = (
        (F.col("b.vec_id") < F.col("a.vec_id"))
        if dominators_only
        else (F.col("a.vec_id") != F.col("b.vec_id"))
    )
    return (
        a.join(b, (F.col("a.t") == F.col("b.t")) & (F.col("a.bucket") == F.col("b.bucket")) & pred)
        .select(F.col("a.vec_id").alias("vec_id"), F.col("b.vec_id").alias("neighbor_id"))
        .distinct()
    )


def _agg_sum(arr):
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _exact_rescore(e: DataFrame, cand: DataFrame) -> DataFrame:
    """Exact cosine on candidate pairs only: (vec_id, neighbor_id, sim).
    Sequential JVM fold over the 64-dim arrays — same evaluation order as the
    DuckDB list_sum fold, so the doubles are bit-identical cross-engine."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norms = e.select(
        "vec_id", v.alias("v"), F.sqrt(_agg_sum(F.transform(v, lambda x: x * x))).alias("nrm")
    )
    na, nb = norms.alias("na"), norms.alias("nb")
    c = cand.alias("c")
    return (
        c.join(na, F.col("na.vec_id") == F.col("c.vec_id"))
        .join(nb, F.col("nb.vec_id") == F.col("c.neighbor_id"))
        .select(
            F.col("c.vec_id").alias("vec_id"),
            F.col("c.neighbor_id").alias("neighbor_id"),
            (
                _agg_sum(F.zip_with(F.col("na.v"), F.col("nb.v"), lambda x, y: x * y))
                / (F.col("na.nrm") * F.col("nb.nrm"))
            ).alias("sim"),
        )
    )


@op(
    "sim_knn_lsh",
    oracle=_lsh_cand_cte(LSH_TABLES, LSH_BITS, LSH_BUCKET_CAP, "a.vec_id <> b.vec_id")
    + """
    , v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM v
    ), scored AS (
      SELECT c.vec_id, c.neighbor_id,
             list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) / (a.nrm * b.nrm) AS sim
      FROM cand c JOIN n a ON a.vec_id = c.vec_id JOIN n b ON b.vec_id = c.neighbor_id
    ), ranked AS (
      SELECT vec_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS rn
      FROM scored
    )
    SELECT vec_id, neighbor_id, round(sim, 4) AS sim FROM ranked WHERE rn <= 5
    """,
)
def sim_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 cosine neighbors via random-hyperplane LSH: 4
    tables × 6 sign-bits bucket the vectors; candidates share a bucket in
    ≥1 table; exact cosine rescoring (sequential fold, both engines) ranks
    them. Hyperplane weights are md5-derived so the bucketing is
    reproducible cross-engine; projections sum DECIMAL(38,8) products so
    every sign bit is order-independent.

    Scale: per-table bucket joins replace the dense n×n scan, and the
    INDEX side of each bucket is capped at its 32 lowest vec_ids (the
    standard hot-bucket control) so join fan-out is bounded at
    n × tables × 32 even when a bucket goes degenerate (duplicate-heavy
    corpora); the query side stays uncapped so every vector keeps full
    candidate coverage. Recall tunes with (tables, bits, cap) — a real
    deployment grows bits ~log2(n/target_bucket) with the corpus."""
    from pyspark.sql import Window

    # repartition: posexplode + interpreted folds off a one-split scan at
    # test scale would otherwise run single-core
    e = load(spark, sf_dir).embeddings.repartition(embed_partitions(spark), "vec_id")
    cand = _lsh_candidates(spark, e, LSH_TABLES, LSH_BITS, LSH_BUCKET_CAP, dominators_only=False)
    scored = _exact_rescore(e, cand)
    w_rank = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= 5)
        .select("vec_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


@op(
    "dedup_embed_cosine",
    oracle=_lsh_cand_cte(DEDUP_LSH_TABLES, DEDUP_LSH_BITS, LSH_BUCKET_CAP, "b.vec_id < a.vec_id")
    + """
    , ev AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv FROM embeddings
    ), en AS (
      SELECT vec_id, vv, sqrt(list_sum(list_transform(vv, x -> x * x))) AS nrm FROM ev
    ), dominated AS (
      SELECT DISTINCT c.vec_id
      FROM cand c JOIN en a ON a.vec_id = c.vec_id JOIN en b ON b.vec_id = c.neighbor_id
      WHERE list_sum(list_transform(list_zip(a.vv, b.vv), p -> p[1] * p[2])) / (a.nrm * b.nrm) >= 0.45
    )
    SELECT vec_id FROM embeddings
    WHERE vec_id NOT IN (SELECT vec_id FROM dominated)
    """,
)
def dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup removal: a vector survives unless a
    SMALLER-id candidate vector lies within cosine ≥ 0.45 (min-id survivor
    per near-dup relation — the semantic-dedup step of a training-data
    pipeline, run on embeddings instead of text).

    Candidates come from the banded-LSH machinery (8 tables × 3 sign-bits of
    the md5-derived hyperplane family, ≈0.92 pair recall at sim 0.45, index
    side capped at the 32 lowest vec_ids per bucket — exactly the likely
    dominators), then exact cosine rescoring on candidates only. This is the
    100 TB shape: bucket hash-joins + a left-anti against dominated ids, no
    driver-side index collect, no full-corpus broadcast (the r4 form
    ``.toPandas()``-ed the whole embedding table into one broadcast var).
    The quantizer is deterministic, and the oracle mirrors the SAME candidate
    generation — the approximation itself is exact-oracled, like sim_knn_lsh.
    Recall tunes with (tables, bits, cap) as the corpus grows."""
    e = load(spark, sf_dir).embeddings.repartition(embed_partitions(spark), "vec_id")
    cand = _lsh_candidates(
        spark, e, DEDUP_LSH_TABLES, DEDUP_LSH_BITS, LSH_BUCKET_CAP, dominators_only=True
    )
    dominated = (
        _exact_rescore(e, cand)
        .where(F.col("sim") >= SIM_THRESHOLD)
        .select("vec_id")
        .distinct()
    )
    return e.select("vec_id").join(dominated, "vec_id", "left_anti")


_IVF_NPROBE = 2

_ORACLE_IVF = """
    WITH e AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
    ), cx AS (  -- decimal-exact label centroids (same construction as embed_label_centroid)
      SELECT label, p.pos,
             CAST(CAST(CAST(sum(CAST(v[p.pos] AS DECIMAL(38,8))) AS DOUBLE) / count(*) AS VARCHAR) AS DOUBLE) AS mean_val
      FROM e CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) p
      GROUP BY label, p.pos
    ), cent AS (
      SELECT label AS cell, list(mean_val ORDER BY pos) AS c FROM cx GROUP BY label
    ), vn AS (
      SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
    ), cn AS (
      SELECT cell, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS cnrm FROM cent
    ), vc AS (  -- vector-to-centroid cosine
      SELECT vn.vec_id, cn.cell,
             list_sum(list_transform(list_zip(vn.v, cn.c), p -> p[1] * p[2])) / (vn.nrm * cn.cnrm) AS csim
      FROM vn CROSS JOIN cn
    ), assign AS (  -- each vector lives in its nearest cell
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn FROM vc
      ) WHERE rn = 1
    ), probes AS (  -- each query searches its 2 nearest cells
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn FROM vc
      ) WHERE rn <= 2
    ), cand AS (
      SELECT p.vec_id AS vec_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.vec_id
    ), scored AS (
      SELECT c.vec_id, c.neighbor_id,
             list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) / (a.nrm * b.nrm) AS sim
      FROM cand c JOIN vn a ON a.vec_id = c.vec_id JOIN vn b ON b.vec_id = c.neighbor_id
    )
    SELECT vec_id, neighbor_id, round(sim, 4) AS sim FROM (
      SELECT vec_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS rn
      FROM scored
    ) WHERE rn <= 5
"""


def _ivf_probe_rescore(e: DataFrame, cent: DataFrame) -> DataFrame:
    """The IVF search plan, shared by both quantizers (label means /
    seeded KMeans): assign every vector to its nearest cell, probe each
    query's ``_IVF_NPROBE`` nearest cells, exact cosine rescoring within
    the probed cells only, top-5 per query. ``cent`` is a
    (cell, c: array<double>, cnrm) frame — tiny (cells × dim) by
    construction, so the vector-to-centroid scoring is a broadcast cross
    join; the candidate join is a hash join on the cell id. Scoring is
    the ONE shared kernel (_cell_scores) — assign-at-build and
    score-at-serve cannot silently diverge (r11 VERDICT queue #2)."""
    from pyspark.sql import Window

    agg_sum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    vn = _norm_vectors(e)
    ranked = _cell_scores(e, cent)
    assign = ranked.where(F.col("crank") == 1).select("vec_id", "cell")
    probes = ranked.where(F.col("crank") <= _IVF_NPROBE).select("vec_id", "cell")

    p, a = probes.alias("p"), assign.alias("a")
    cand = p.join(
        a, (F.col("a.cell") == F.col("p.cell")) & (F.col("a.vec_id") != F.col("p.vec_id"))
    ).select(F.col("p.vec_id").alias("vec_id"), F.col("a.vec_id").alias("neighbor_id"))

    na, nb = vn.alias("na"), vn.alias("nb")
    c = cand.alias("c")
    scored = (
        c.join(na, F.col("na.vec_id") == F.col("c.vec_id"))
        .join(nb, F.col("nb.vec_id") == F.col("c.neighbor_id"))
        .select(
            F.col("c.vec_id").alias("vec_id"),
            F.col("c.neighbor_id").alias("neighbor_id"),
            (
                agg_sum(F.zip_with(F.col("na.v"), F.col("nb.v"), lambda x, y: x * y))
                / (F.col("na.nrm") * F.col("nb.nrm"))
            ).alias("sim"),
        )
    )
    w_rank = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= 5)
        .select("vec_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )

@op("sim_knn_ivf", oracle=_ORACLE_IVF)
def sim_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 cosine neighbors via an IVF layout: coarse
    centroids are the (decimal-exact, deterministic) per-label mean
    vectors, every vector is assigned to its nearest cell, and each query
    probes its 2 nearest cells — exact cosine rescoring within the probed
    cells only. Complements sim_knn_lsh: IVF for clustered corpora, LSH
    for unstructured ones; both oracle-EXACT because the quantizer itself
    is deterministic. ``sim_knn_ivf_kmeans`` is the same search plan with
    TRAINED (seeded-KMeans) cells — the 100 TB deployment form.

    Scale: candidates per query ≈ nprobe × (n/cells); centroids stay tiny
    (cells × dim) → broadcast; the cell join is a hash join on cell id."""
    e = load(spark, sf_dir).embeddings.repartition(embed_partitions(spark), "vec_id")
    return _ivf_probe_rescore(e, label_centroids(e))


def label_centroids(e: DataFrame) -> DataFrame:
    """(cell, c: array<double>, cnrm): the decimal-exact per-label mean
    vectors — the deterministic coarse quantizer shared by sim_knn_ivf and
    sink_ivf_layout (same construction as embed_label_centroid)."""
    agg_sum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    exploded = e.select("label", F.posexplode("embedding").alias("pos", "val")).select(
        "label", "pos", F.col("val").cast("double").alias("val")
    )
    return (
        exploded.groupBy("label", "pos")
        .agg(
            (F.sum(F.col("val").cast("decimal(38,8)")).cast("double") / F.count("*"))
            .cast("double")
            .alias("mean_val")
        )
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mean_val"))).alias("pairs"))
        .select(
            F.col("label").alias("cell"),
            F.transform("pairs", lambda p: p.mean_val).alias("c"),
        )
        .withColumn("cnrm", F.sqrt(agg_sum(F.transform(F.col("c"), lambda x: x * x))))
    )


def _norm_vectors(e: DataFrame) -> DataFrame:
    """(vec_id, v: array<double>, nrm): double-cast vectors with their L2
    norm — the shared pre-scoring projection of the whole IVF family
    (assign, rescore, serve, diagnostics)."""
    agg_sum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select("vec_id", v.alias("v")).withColumn(
        "nrm", F.sqrt(agg_sum(F.transform(F.col("v"), lambda x: x * x)))
    )


def ivf_assign(e: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cell): each vector's nearest cell by cosine (csim desc,
    cell asc tie-break) — assignment IS the crank==1 slice of the shared
    _cell_scores kernel, so the sinks assign with the exact expression
    the serving ops score with."""
    return _cell_scores(e, cent).where(F.col("crank") == 1).select("vec_id", "cell")


# k is env-tunable because the IVF cost model needs cells to GROW with the
# corpus: candidates/query ≈ nprobe·(n/k), so fixed k at 100× data means
# 100×-wider cells and a quadratic-ish rescore. The standard setting is
# k ≈ √n (cell width and cell count both √n); the sf-fixture default stays
# 8 (≈ √500 rounded to the label-cardinality neighborhood the EXACT-oracle
# sibling uses), and the 100× ladder runs k=448 ≈ √200k.
IVF_KMEANS_K = int(os.environ.get("UP_IVF_KMEANS_K", "8"))
IVF_KMEANS_SEED = 20260814


def _np_unit(v):
    """Rows of ``v`` (float64 (n, d)) L2-normalized with the exact IEEE
    sequence of the _unit_embeddings kernel: ``v*v`` elementwise,
    ``sqrt(cumsum(sq)[:, -1])`` (the left-to-right 0.0-seeded fold), then
    ``v / nrm``. THE single copy of the raw→unit normalize (ADVICE r14:
    it was duplicated across _unit_embeddings, _kmeans_cells,
    _pq_codebooks and _probe_cells_ranked with a per-site bit-identity
    claim that a future edit could silently break) — every site routes
    here, and test_unit_embeddings_bitwise pins the sequence itself.
    Empty input passes through (no axis to reduce)."""
    import numpy as np

    if len(v) == 0:
        return v
    return v / np.sqrt(np.cumsum(v * v, axis=1)[:, -1])[:, None]


def _unit_embeddings(e: DataFrame) -> DataFrame:
    """(vec_id, u): L2-normalized double vectors — cosine-nearest on these
    is Euclidean-nearest, the precondition for the kmeans quantizer.

    r14: Arrow-vectorized (guide §4.2). The r13 form was a nested
    interpreted ``transform``/``aggregate`` lambda chain — ~130 boxed
    evaluations per row, measured ~0.25 ms/row at sf0.1 (0.5 s per corpus
    pass on 2 000 rows; CPU-hours at 10⁸ rows). The kernel is
    BIT-IDENTICAL to that expression: ``v*v`` and ``v/nrm`` are the same
    elementwise IEEE-754 ops, ``np.cumsum(sq)[:, -1]`` IS the left-to-right
    0.0-seeded fold the old ``aggregate`` ran (0.0 + x == x bitwise, and
    cumsum accumulates strictly sequentially — numpy's pairwise-sum
    shortcut applies to ``np.sum``, not ``cumsum``), and ``np.sqrt`` is
    IEEE sqrt like Spark's. The persisted-index u columns and every EXACT
    oracle that reproduces the normalize in SQL are therefore unchanged —
    pinned by tests/test_invariants.py::test_unit_embeddings_bitwise."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            u = _np_unit(v)
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "u": list(u)})

    return e.select("vec_id", "embedding").mapInPandas(gen, "vec_id long, u array<double>")


# Coarse-quantizer training sample bound: ~256 rows per centroid (the FAISS
# guideline for IVF coarse training). 0 → derive 256·k at call time. At the
# ladder's k=448 that is ~115k rows × 512 B ≈ 59 MB collected — bounded by
# k (√n), never by the corpus.
IVF_TRAIN_CAP = int(os.environ.get("UP_IVF_TRAIN_CAP", "0"))


class _CentroidModel(NamedTuple):
    """A freshly trained coarse quantizer: the (cell, c, cnrm) frame for
    persisting/joining, plus the driver-side row copy (k ≈ √n rows of model
    metadata — they were BORN on the driver, so probe-side consumers must
    not launch a collect job to get them back; r14 profile: 0.32 s to
    round-trip 8 rows through a 32-partition createDataFrame). Explicit
    replacement for the r14 ``df._up_centroids`` attribute memo, which any
    intervening DataFrame transformation silently dropped (VERDICT r14
    "What's wrong" #5)."""

    df: DataFrame
    rows: list


def _kmeans_cells(spark: SparkSession, unit: DataFrame, raw: DataFrame | None = None) -> "_CentroidModel":
    """(cell, c, cnrm): the TRAINED coarse quantizer — Lloyd's fit
    DRIVER-SIDE on a bounded deterministic sample of the unit vectors
    (first min(256·k, n) rows by md5(vec_id) order — the _pq_codebooks
    convention: one TakeOrdered job, first-k-in-sample init, no RNG),
    centers relabeled by (first coordinate, norm) sort so cell ids are
    run-stable. k x dim driver literals → broadcast. Shared by
    sim_knn_ivf_kmeans (in-memory) and the persisted serving/lifecycle
    family (sink/scan_ivf_probe_kmeans, append/compact/delete/retrain,
    ivfpq).

    Why driver-side (guide §1.2 step 1, §5): the previous MLlib k-means||
    fit launched ~25 driver-blocking Spark jobs (init passes + 20 Lloyd's
    sweeps, each a 32-task stage over a ~1000-row sample) — r14
    measurement: ~2.5 s of q_ivf's 4.8 s at sf0.1, pure scheduling
    overhead. Training on a bounded sample is model METADATA work, like
    the PQ codebooks: one job to collect ≤256·k rows, then numpy Lloyd's
    (matmul assignment step) in milliseconds. The corpus-sized work —
    assignment — still runs distributed, exactly once."""
    import numpy as np

    cap = IVF_TRAIN_CAP or 256 * IVF_KMEANS_K
    # When the caller holds the RAW embeddings frame, sample THAT and
    # normalize the ≤cap rows driver-side (identical IEEE sequence to the
    # _unit_embeddings kernel: float32→float64 upcast, v/sqrt(cumsum(v²)
    # last) — so the trained centers are bit-unchanged). Sampling the unit
    # frame forces the TakeOrdered job to run the Arrow normalize kernel
    # over the ENTIRE corpus just to keep cap rows — a full corpus-wide
    # Python pass per training (r14 profile: a 0.28 s 1-task Python stage
    # per q_ivf run at sf0.1) that the raw path replaces with a JVM-only
    # scan + TakeOrdered (guide §4: don't cross the Python boundary for
    # work an expression-free scan can do).
    if raw is not None:
        sample = (
            raw.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
            .limit(cap)
            .select("embedding")
            .toPandas()
        )
        v = np.array(sample["embedding"].tolist(), dtype=np.float64)
        X = _np_unit(v)
    else:
        sample = (
            unit.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
            .limit(cap)
            .select("u")
            .toPandas()
        )
        X = np.array(sample["u"].tolist(), dtype=np.float64)
    k = max(1, min(IVF_KMEANS_K, len(X)))
    cents = X[:k].copy()
    prev_assign = None
    for _ in range(20):
        # unit-norm rows: argmin ||x-c||² == argmin (||c||² - 2·x·c)
        d = (cents * cents).sum(axis=1)[None, :] - 2.0 * (X @ cents.T)
        assign = d.argmin(axis=1)
        if prev_assign is not None and (assign == prev_assign).all():
            break
        prev_assign = assign
        for c in range(k):
            m = assign == c
            if m.any():  # empty cluster: carry the previous center over
                cents[c] = X[m].mean(axis=0)
    centers = sorted(
        ([float(x) for x in c] for c in cents),
        key=lambda c: (c[0], sum(x * x for x in c)),
    )
    import math

    # cnrm driver-side, same left-to-right 0.0-seeded fold as the old
    # interpreted agg_sum expression — bit-identical IEEE sequence, so the
    # parquet-persisted centroids are unchanged. coalesce(1): k ≈ √n rows
    # is one slice of model metadata, not a 32-slice parallelize.
    rows = []
    for i, c in enumerate(centers):
        s = 0.0
        for x in c:
            s += x * x
        rows.append((i, c, math.sqrt(s)))
    df = spark.createDataFrame(rows, "cell int, c array<double>, cnrm double").coalesce(1)
    return _CentroidModel(df, rows)


def _cell_matmul_rescore(key, probes_pdf, members_pdf):
    """Per-cell cogroup kernel: (probing queries × cell members) cosine
    sims as ONE vectorized matmul (unit vectors — the dot IS the cosine),
    emitting only per-query top-5 rows. Query rows are tiled to
    ≤ KNN_TILE_ELEMS sims elements so a hot cell cannot blow a task's
    memory. Shared by sim_knn_ivf_kmeans and scan_ivf_probe_kmeans."""
    import numpy as np
    import pandas as pd

    if len(probes_pdf) == 0 or len(members_pdf) == 0:
        return pd.DataFrame({"vec_id": [], "neighbor_id": [], "sim": []}).astype(
            {"vec_id": "int64", "neighbor_id": "int64", "sim": "float64"}
        )
    qids = probes_pdf["vec_id"].to_numpy(np.int64)
    mids = members_pdf["mvec_id"].to_numpy(np.int64)
    Q = np.array(probes_pdf["u"].tolist(), dtype=np.float64)
    M = np.array(members_pdf["mu"].tolist(), dtype=np.float64)
    # sort members by id ONCE per cell so column order == id order: the
    # (sim desc, neighbor asc) rank is then the bounded exact top-k
    # (_topk_cols_exact) instead of a full-member-width lexsort per row,
    # and the self-mask is one searchsorted lookup per row instead of an
    # O(rows × members) boolean outer-equality (r14, guide §1.2 per-task
    # work — identical output, mids are unique within a cell).
    morder = np.argsort(mids, kind="stable")
    mids = mids[morder]
    M = M[morder]
    rows_per_tile = max(1, KNN_TILE_ELEMS // max(1, len(mids)))
    out = []
    for lo in range(0, len(qids), rows_per_tile):
        sims = Q[lo : lo + rows_per_tile] @ M.T
        _mask_self_inplace(np, qids[lo : lo + rows_per_tile], mids, sims)
        k = min(5, sims.shape[1])
        order = _topk_cols_exact(np, sims, k)
        tq = qids[lo : lo + rows_per_tile]
        sel = np.take_along_axis(sims, order, axis=1)
        keep = np.isfinite(sel)
        out.append(
            pd.DataFrame(
                {
                    "vec_id": np.repeat(tq, k)[keep.ravel()],
                    "neighbor_id": mids[order].ravel()[keep.ravel()],
                    "sim": sel.ravel()[keep.ravel()],
                }
            )
        )
    return pd.concat(out, ignore_index=True)


def _ranked_cell_rescore(key, pdf):
    """Single-input per-cell kernel over _probe_cells_ranked rows: the
    members of a cell are exactly its rank-1 rows and its probing queries
    are all its rows (rank-1 rows probe their own cell too), so one
    grouped frame carries both rescore sides — delegates to
    _cell_matmul_rescore unchanged."""
    import pandas as pd

    own = pdf[pdf["rn"] == 1]
    members_pdf = pd.DataFrame({"mvec_id": own["vec_id"], "mu": own["u"]})
    return _cell_matmul_rescore(key, pdf, members_pdf)


def _selfgroup_topk(ranked: DataFrame) -> DataFrame:
    """Self-kNN rescore when probes and members come from the SAME ranked
    assignment frame (sim_knn_ivf_kmeans): ONE groupBy("cell") apply
    instead of a two-sided cogroup whose sides each re-evaluated the whole
    scan → normalize → assign subtree (r14 profile: two ~0.7 s duplicate
    stages per run at sf0.1; at corpus scale, two full corpus passes where
    one suffices — guide §7.2 "duplicated subtrees"). Merge window
    identical to _cogroup_topk."""
    per_cell = ranked.groupBy("cell").applyInPandas(
        _ranked_cell_rescore, "vec_id long, neighbor_id long, sim double"
    )
    w_rank = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        per_cell.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= 5)
        .select("vec_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


def _cogroup_topk(probes: DataFrame, members: DataFrame) -> DataFrame:
    """Cell-cogrouped matmul rescore + the exact ≤ nprobe·5-per-query merge
    window (per-cell top-5 dominates, so the merge is exact — the
    sim_cosine_knn chunk-merge argument)."""
    per_cell = (
        probes.groupBy("cell")
        .cogroup(members.groupBy("mcell"))
        .applyInPandas(_cell_matmul_rescore, "vec_id long, neighbor_id long, sim double")
    )
    w_rank = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        per_cell.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= 5)
        .select("vec_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


@op("sim_knn_ivf_kmeans", oracle=None)
def sim_knn_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF kNN with TRAINED coarse cells (VERDICT r7 item 6): the
    quantizer is a seeded KMeans (k-means||) fit on the L2-NORMALIZED
    embeddings — Euclidean-nearest on unit vectors is cosine-nearest, so
    the trained cells partition the sphere the way the cosine search
    probes it. Assign/probe follows sim_knn_ivf's shape (broadcast
    centroids, per-vector nearest cell, 2 probed cells per query); the
    within-cell rescore is the DEPLOYMENT kernel — a per-cell blocked
    numpy matmul via ``applyInPandas`` cogroup — instead of the sibling's
    pair-join fold.

    Why the kernel differs from sim_knn_ivf's: the pair-join rescore
    ships both 64-double embedding arrays into every candidate row —
    nprobe·(n/k)·n pairs × ~1 KB ≈ 180 GB through one stage at the 100×
    replica (measured: it was ~330 s of the op's 386 s there). The
    cogroup form shuffles each embedding ONCE by cell id (n rows, ~100 MB
    at 100×), then each cell's (probing queries × members) similarity is
    one vectorized matmul emitting only per-query top-5 rows; a final
    ≤ nprobe·5-rows-per-query window merges cells (per-cell top-5
    dominates, so the merge is exact — the sim_cosine_knn chunk-merge
    argument). Query rows are tiled to ≤ KNN_TILE_ELEMS sims elements so
    a hot cell cannot blow a task's memory. The exact-oracled sibling
    keeps the fold rescore: its DuckDB oracle reproduces fold summation
    order; the ROWS-only op is free to sum in matmul order.

    Oracle = ROWS (SURVEY §2.0 rule 5): KMeans internals aren't
    SQL-expressible; determinism within Spark is enforced by the fixed
    seed/initMode + lexsort tie-breaks, and quality by the recall@5
    invariant test (tests/test_invariants.py) against the exact blocked
    kNN — the same gate the LSH and label-IVF paths carry.

    Scale: the quantizer trains on a deterministic md5-derived HALF-SAMPLE
    of the corpus (first md5 nibble of vec_id < 8 — the doc_train_split
    convention; the FAISS practice of fitting coarse cells on a sample and
    assigning everything), coalesced to defaultParallelism — training cost
    is bounded by the sample, not the corpus, and a 100 TB deploy would
    additionally cap the sample's absolute size (~256·k rows is the FAISS
    guideline). Assignment still touches every vector exactly once. k is
    env-tunable (UP_IVF_KMEANS_K) because cells must GROW ~√n with the
    corpus — candidates/query ≈ nprobe·(n/k), so fixed k at 100× data
    means 100×-wider cells. Centroids stay k × dim driver literals →
    broadcast."""
    # No explicit repartition (r14): the r13 repartition(embed_partitions,
    # vec_id) existed so the MLlib k-means|| init saw a stable partitioning
    # and the interpreted fold stage had width; the trainer now samples by
    # a TOTAL (md5, vec_id) order — partition-independent — and the assign
    # kernel is a cheap map-side matmul, so the scan's own byte-sized
    # splits are the right parallelism at every scale (guide §2.4: that
    # exchange moved every row once for nothing).
    e = load(spark, sf_dir).embeddings
    cent = _kmeans_cells(spark, _unit_embeddings(e), raw=e)

    # assign + probes in ONE map-side kernel pass (r14, guide §2.4/§4.2):
    # _probe_cells_ranked replaces the r13 crossJoin + interpreted fold +
    # n·k-row vec_id window; normalize=True fuses _unit_embeddings into
    # the same kernel (one Python hop); members are the rank-1 rows of
    # the same frame, so the rescore is a single groupBy("cell") apply
    # (_selfgroup_topk) — one corpus pass end to end.
    ranked = _probe_cells_ranked(e, cent, _IVF_NPROBE, normalize=True)
    return _selfgroup_topk(ranked)


# Product quantization (sim_knn_pq). 64 dims -> PQ_M=8 subspaces x 8 dims,
# PQ_K=16 centroids per subspace -> each vector compresses to 8 codes of
# 4 bits = ONE int32 (packed into a long column): 8 bytes/vector of index
# instead of 512, the memory-bound ANN form (a 100M-vector corpus is an
# 0.8 GB code table vs 51 GB of raw float64). Codebooks are trained on a
# bounded deterministic sample with a data-order-initialized Lloyd's loop
# (no RNG, no MLlib dependency) so the whole op is run-stable; quality is
# gated by the recall@5 invariant test like the LSH/IVF siblings.
PQ_M = 8
PQ_SUBDIM = 8
PQ_K = 16
PQ_TRAIN_CAP = 2048
PQ_CAND = 64
PQ_ITERS = 15


def _pq_codebooks(unit: DataFrame, raw: DataFrame | None = None):
    """Train per-subspace codebooks driver-side on a BOUNDED sample:
    PQ_TRAIN_CAP rows chosen by md5(vec_id) order (deterministic,
    corpus-size-independent — the FAISS convention of training the
    quantizer on a small sample, done as one TakeOrdered job; ~1 MB
    collected at the cap). Lloyd's with first-k-in-sample init and
    empty-cluster carry-over, fixed PQ_ITERS sweeps — bit-reproducible
    across runs and partitionings. Returns (PQ_M, PQ_K, PQ_SUBDIM) f64.

    ``raw``: when the caller holds the raw embeddings frame, the sample
    job is a JVM-only scan + TakeOrdered and the ≤cap rows normalize
    driver-side (bit-identical IEEE sequence to _unit_embeddings) —
    sampling the unit frame instead runs the Arrow normalize kernel over
    the whole corpus just to keep cap rows (the _kmeans_cells argument)."""
    import numpy as np

    if raw is not None:
        sample = (
            raw.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
            .limit(PQ_TRAIN_CAP)
            .select("embedding")
            .toPandas()
        )
        v = np.array(sample["embedding"].tolist(), dtype=np.float64)
        X = _np_unit(v)
    else:
        sample = (
            unit.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
            .limit(PQ_TRAIN_CAP)
            .toPandas()
        )
        X = np.array(sample["u"].tolist(), dtype=np.float64)
    books = np.empty((PQ_M, PQ_K, PQ_SUBDIM))
    for s in range(PQ_M):
        sub = X[:, s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
        cents = sub[:PQ_K].copy()
        for _ in range(PQ_ITERS):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(PQ_K):
                m = assign == c
                if m.any():
                    cents[c] = sub[m].mean(axis=0)
        books[s] = cents
    return books


def _pq_encode(books) -> "callable":
    """mapInPandas kernel: vector -> 8 nearest-centroid codes packed into
    one long (4 bits/code). Codebooks travel in the task closure (1024
    doubles)."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            U = np.array(pdf["u"].tolist(), dtype=np.float64)
            packed = np.zeros(len(U), dtype=np.int64)
            for s in range(PQ_M):
                sub = U[:, s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
                d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                packed |= d2.argmin(axis=1).astype(np.int64) << (4 * s)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(np.int64), "code": packed})

    return gen


@op("sim_knn_pq", oracle=None)
def sim_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 cosine neighbors via product quantization with
    asymmetric distance computation (ADC) — the memory-bound member of the
    ANN ladder (LSH: unstructured corpora; IVF: clustered corpora; PQ:
    index-must-fit-nowhere corpora). Each vector is compressed to 8
    4-bit codes (one packed long); a query scans the code table by summing
    8 precomputed query-to-centroid dot products per candidate (the ADC
    lookup — no decompression), keeps its PQ_CAND best, and the final
    top-5 comes from an EXACT cosine rescore of those candidates only
    (the sim_knn_lsh/sim_knn_ivf rescore discipline).

    Spark shape: codebooks are trained on a bounded deterministic sample
    (_pq_codebooks) and ship in task closures; encoding is one Arrow
    mapInPandas pass, pinned so chunk fetches do not re-encode; the scan
    reuses the sequential bounded-chunk broadcast pattern of
    sim_cosine_knn — but a chunk of CODES is 8 bytes/row, so the same
    500k-row chunk cap that holds 256 MB of raw index holds 4 MB here,
    and a 1e9-vector corpus scans as ~8 GB of codes total where the exact
    path streams 512 GB. Per-task transients stay tiled (KNN_TILE_ELEMS).

    Oracle = ROWS (SURVEY §2.0 rule 5): the trained quantizer is ML, not
    SQL. Determinism inside Spark: data-order Lloyd init + fixed sweeps,
    id-asc tie-breaks everywhere; recall@5 vs the exact kNN is gated in
    tests/test_invariants.py."""
    import numpy as np

    from pyspark.storagelevel import StorageLevel

    e = load(spark, sf_dir).embeddings
    agg_sum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    unit = (
        e.select("vec_id", v.alias("v"))
        .withColumn("nrm", F.sqrt(agg_sum(F.transform(F.col("v"), lambda x: x * x))))
        .select("vec_id", F.transform("v", lambda x: x / F.col("nrm")).alias("u"))
    )
    books = _pq_codebooks(unit, raw=e)
    codes = pin(unit.mapInPandas(_pq_encode(books), "vec_id long, code long"))
    return _pq_adc_search(spark, e, unit, codes, books)


def _pq_adc_search(spark: SparkSession, e: DataFrame, unit: DataFrame, codes: DataFrame, books) -> DataFrame:
    """The ADC scan + exact-rescore half of the PQ path, factored so the
    persisted-index probe (scan_pq_probe) runs the same search over codes
    READ FROM STORAGE: sequential bounded-chunk broadcasts of the code
    table (8 B/row — a 500k-row chunk is 4 MB), pair-summed lookup
    tables, global top-PQ_CAND merge, exact cosine rescore of candidates
    only. ``unit`` is the QUERY workload (any subset of vectors)."""
    import numpy as np

    from pyspark.storagelevel import StorageLevel

    # bounded chunks of the code table (quantile boundaries — the
    # _index_chunks argument: chunk count tracks row count, never id-space
    # width; each fetch is a pushed-down vec_id range over the codes frame)
    total, lo, hi = codes.agg(F.count("*"), F.min("vec_id"), F.max("vec_id")).first()
    target = max(INDEX_CHUNK_MIN, min(INDEX_CHUNK_CAP, total))
    n_chunks = max(1, -(-total // target))
    if n_chunks == 1:
        cuts: list[int] = []
    else:
        eps = max(1e-4, 0.05 / n_chunks)
        qs = codes.stat.approxQuantile("vec_id", [i / n_chunks for i in range(1, n_chunks)], eps)
        cuts = sorted({int(q) for q in qs if lo < int(q) <= hi})
    bounds = [lo, *cuts, hi + 1]

    def adc_kernel(bc):
        import pandas as pd

        def gen(batches):
            # pcodes: (chunk, PQ_M//2) uint8 — adjacent 4-bit codes packed
            # into one byte driver-side, so the scan gathers from 4
            # PAIR-SUM tables of 256 entries instead of 8 tables of 16
            # (half the fancy-index traffic — the dominant cost: the r8
            # profile put 425 of 696 s in this loop before packing)
            aids, pcodes = bc.value
            rows_per_tile = max(1, KNN_TILE_ELEMS // max(1, len(aids)))
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                qids = pdf["vec_id"].to_numpy(np.int64)
                Q = np.array(pdf["u"].tolist(), dtype=np.float64)
                # Tq[b, s, k] = <q_sub, centroid>, pair-summed into
                # Tp[b, p, c0*16+c1]; float32 — the ADC scan is the
                # approximate stage (the exact f64 rescore follows), and
                # f32 halves the gather bandwidth
                Tq = np.einsum(
                    "bsd,skd->bsk", Q.reshape(len(Q), PQ_M, PQ_SUBDIM), books
                ).astype(np.float32)
                Tp = (Tq[:, 0::2, :, None] + Tq[:, 1::2, None, :]).reshape(
                    len(Q), PQ_M // 2, PQ_K * PQ_K
                )
                out = []
                for t0 in range(0, len(qids), rows_per_tile):
                    T = Tp[t0 : t0 + rows_per_tile]
                    sims = np.zeros((len(T), len(aids)), dtype=np.float32)
                    for p in range(PQ_M // 2):
                        sims += T[:, p, :][:, pcodes[:, p]]
                    sims[qids[t0 : t0 + rows_per_tile, None] == aids[None, :]] = -np.inf
                    k = min(PQ_CAND, sims.shape[1])
                    # per-chunk candidates need no intra-chunk order — the
                    # global top-PQ_CAND window sorts the union by
                    # (asim desc, id asc); argpartition (deterministic on
                    # identical input) avoids lexsorting tile×chunk rows
                    top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
                    sel = np.take_along_axis(sims, top, axis=1)
                    keep = np.isfinite(sel)
                    out.append(
                        pd.DataFrame(
                            {
                                "vec_id": np.repeat(qids[t0 : t0 + rows_per_tile], k)[keep.ravel()],
                                "neighbor_id": aids[top].ravel()[keep.ravel()],
                                "asim": sel.ravel()[keep.ravel()].astype(np.float64),
                            }
                        )
                    )
                yield pd.concat(out, ignore_index=True)

        return gen

    q = unit.repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions")), "vec_id"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    partials: list[DataFrame] = []
    try:
        for start, end in zip(bounds, bounds[1:]):
            pdf = (
                codes.where((F.col("vec_id") >= start) & (F.col("vec_id") < end))
                .toPandas()
                .sort_values("vec_id", ignore_index=True)
            )
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(np.int64)
            packed = pdf["code"].to_numpy(np.int64)
            # pair-packed: pcodes[:, p] = code_{2p}*16 + code_{2p+1}, the
            # flat index into the kernel's 256-entry pair-sum tables
            pcodes = np.stack(
                [
                    ((packed >> (8 * p)) & 0xF) * 16 + ((packed >> (8 * p + 4)) & 0xF)
                    for p in range(PQ_M // 2)
                ],
                axis=1,
            ).astype(np.uint8)
            bc = spark.sparkContext.broadcast((ids, pcodes))
            try:
                partials.append(
                    pin(q.mapInPandas(adc_kernel(bc), "vec_id long, neighbor_id long, asim double"))
                )
            finally:
                bc.destroy()
    finally:
        q.unpersist()
    if not partials:
        return spark.createDataFrame([], "vec_id long, neighbor_id long, sim double")
    allc = reduce(DataFrame.unionAll, partials)
    w_cand = Window.partitionBy("vec_id").orderBy(F.col("asim").desc(), F.col("neighbor_id").asc())
    cand = (
        allc.withColumn("rn", F.row_number().over(w_cand))
        .where(F.col("rn") <= PQ_CAND)
        .select("vec_id", "neighbor_id")
    )
    w_rank = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        _exact_rescore(e, cand)
        .withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= K_NEIGHBORS)
        .select("vec_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


# MMR re-ranking: pool of MMR_POOL exact top-cosine candidates per query,
# greedy maximal-marginal-relevance selection of MMR_K with trade-off
# MMR_LAMBDA — score(d) = λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s). The
# retrieval-diversity standard (Carbonell & Goldstein 1998), here fully
# declarative: k fixed unrolled DataFrame steps, no per-query Python.
MMR_POOL = 10
MMR_K = 5
MMR_LAMBDA = 0.7


def _mmr_oracle() -> str:
    """Unrolled greedy MMR in plain SQL: sel_k builds on sel_{k-1} via a
    penalty join + windowed argmax — the same k-1 fixed steps the Spark
    plan runs, so the selection is identical by construction."""
    sql = _ORACLE_SIMS_CTE + f"""
    , cand AS (
      SELECT vec_id, neighbor_id, round(sim, 4) AS rsim,
             row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS rn
      FROM sims
    ), c10 AS (SELECT vec_id, neighbor_id, rsim FROM cand WHERE rn <= {MMR_POOL}),
    pairs AS (
      SELECT a.vec_id AS q, a.neighbor_id AS x, b.neighbor_id AS y, round(s.sim, 4) AS psim
      FROM c10 a JOIN c10 b ON a.vec_id = b.vec_id AND a.neighbor_id <> b.neighbor_id
      JOIN sims s ON s.vec_id = a.neighbor_id AND s.neighbor_id = b.neighbor_id
    ),
    sel1 AS (
      SELECT vec_id, neighbor_id, rsim, 1 AS mmr_rank FROM (
        SELECT vec_id, neighbor_id, rsim,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY rsim DESC, neighbor_id ASC) AS rn
        FROM c10) WHERE rn = 1
    )"""
    for k in range(2, MMR_K + 1):
        prev = f"sel{k - 1}"
        sql += f""",
    pen{k} AS (
      SELECT p.q, p.x, max(p.psim) AS pen
      FROM pairs p JOIN {prev} s ON s.vec_id = p.q AND s.neighbor_id = p.y
      GROUP BY p.q, p.x
    ),
    step{k} AS (
      SELECT vec_id, neighbor_id, rsim, {k} AS mmr_rank FROM (
        SELECT c.vec_id, c.neighbor_id, c.rsim,
               row_number() OVER (PARTITION BY c.vec_id
                                  ORDER BY {MMR_LAMBDA} * c.rsim - {round(1 - MMR_LAMBDA, 10)} * p.pen DESC,
                                           c.neighbor_id ASC) AS rn
        FROM c10 c
        JOIN pen{k} p ON p.q = c.vec_id AND p.x = c.neighbor_id
        LEFT JOIN {prev} s ON s.vec_id = c.vec_id AND s.neighbor_id = c.neighbor_id
        WHERE s.neighbor_id IS NULL) WHERE rn = 1
    ),
    sel{k} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM step{k})"""
    sql += f"""
    SELECT vec_id, CAST(mmr_rank AS INT) AS mmr_rank, neighbor_id, rsim AS sim
    FROM sel{MMR_K}
    """
    return sql


@op("sim_rerank_mmr", oracle=_mmr_oracle())
def sim_rerank_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (r8 addition): each query's
    exact top-{MMR_POOL} cosine pool is greedily re-ranked to {MMR_K}
    results balancing relevance against redundancy — score = λ·sim(q,d) −
    (1−λ)·max sim(d, selected), λ=0.7 — the standard diversification pass
    a RAG / retrieval stack runs between ANN search and the prompt window
    (near-duplicate passages waste context; MMR keeps one of each).

    Fully declarative: the pool comes from the blocked broadcast-index
    kernel (sim_cosine_knn's plan, pool depth {MMR_POOL}); candidate-pair
    cosines are an _exact_rescore over the ≤ pool²·n_q DISTINCT pairs; the
    greedy loop is {MMR_K}−1 unrolled join+window steps over those two
    pinned frames — each step's state is ≤ k rows/query, pinned so
    Catalyst never re-inlines the growing selection subtree (the minhash
    5×-recompute trap). The DuckDB oracle unrolls the identical steps, so
    the op stays EXACT despite being an iterative algorithm. Ordering
    compares only rounded sims and fixed-literal double arithmetic on
    them — bit-identical cross-engine.

    Scale: every stage is keyed by query id or (query, candidate) — work
    is linear in queries × pool², never corpus²; the pool itself comes
    from the chunk-bounded exact kernel (or, at 100 TB, any ANN sibling —
    the re-rank consumes (vec_id, neighbor_id, sim) triples, not vectors).
    """
    e = load(spark, sf_dir).embeddings

    def emit(np, pd, qids, aids, sims):
        _mask_self_inplace(np, qids, aids, sims)
        top = _topk_cols_exact(np, sims, MMR_POOL)
        rows = np.arange(len(qids))[:, None]
        keep = np.isfinite(sims[rows, top])
        return pd.DataFrame(
            {
                "vec_id": np.repeat(qids, top.shape[1])[keep.ravel()],
                "neighbor_id": aids[top].ravel()[keep.ravel()],
                "sim": sims[rows, top].ravel()[keep.ravel()],
            }
        )

    union = _blocked_result(spark, sf_dir, emit, "vec_id bigint, neighbor_id bigint, sim double")
    if getattr(union, "_up_single_chunk", False):
        # one chunk: per-query top-MMR_POOL is already global (the
        # sim_cosine_knn argument) — skip the merge window's exchange+sort
        cand = pin(union.select("vec_id", "neighbor_id", F.round("sim", 4).alias("rsim")))
    else:
        w10 = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
        cand = pin(
            union.withColumn("rn", F.row_number().over(w10))
            .where(F.col("rn") <= MMR_POOL)
            .select("vec_id", "neighbor_id", F.round("sim", 4).alias("rsim"))
        )
    a, b = cand.alias("a"), cand.alias("b")
    dpairs = a.join(
        b,
        (F.col("a.vec_id") == F.col("b.vec_id"))
        & (F.col("a.neighbor_id") != F.col("b.neighbor_id")),
    ).select(
        F.col("a.vec_id").alias("q"),
        F.col("a.neighbor_id").alias("x"),
        F.col("b.neighbor_id").alias("y"),
    )
    uniq = dpairs.select(F.col("x").alias("vec_id"), F.col("y").alias("neighbor_id")).distinct()
    psims = _exact_rescore(e, uniq).select(
        F.col("vec_id").alias("x"), F.col("neighbor_id").alias("y"), F.round("sim", 4).alias("psim")
    )
    pairs = pin(dpairs.join(psims, ["x", "y"]).select("q", "x", "y", "psim"))

    w1 = Window.partitionBy("vec_id").orderBy(F.col("rsim").desc(), F.col("neighbor_id").asc())
    sel = pin(
        cand.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") == 1)
        .select("vec_id", "neighbor_id", "rsim", F.lit(1).alias("mmr_rank"))
    )
    for k in range(2, MMR_K + 1):
        sel_qy = sel.select(F.col("vec_id").alias("q"), F.col("neighbor_id").alias("y"))
        pen = pairs.join(sel_qy, ["q", "y"]).groupBy("q", "x").agg(F.max("psim").alias("pen"))
        sel_key = sel.select(F.col("vec_id").alias("svec"), F.col("neighbor_id").alias("sid"))
        rem = cand.join(
            sel_key,
            (F.col("vec_id") == F.col("svec")) & (F.col("neighbor_id") == F.col("sid")),
            "left_anti",
        )
        scored = rem.join(
            pen, (rem["vec_id"] == pen["q"]) & (rem["neighbor_id"] == pen["x"])
        ).select("vec_id", "neighbor_id", "rsim", "pen")
        w_k = Window.partitionBy("vec_id").orderBy(
            (F.lit(MMR_LAMBDA) * F.col("rsim") - F.lit(round(1 - MMR_LAMBDA, 10)) * F.col("pen")).desc(),
            F.col("neighbor_id").asc(),
        )
        nxt = (
            scored.withColumn("rn", F.row_number().over(w_k))
            .where(F.col("rn") == 1)
            .select("vec_id", "neighbor_id", "rsim", F.lit(k).alias("mmr_rank"))
        )
        sel = pin(sel.unionByName(nxt))
    return sel.select(
        "vec_id",
        F.col("mmr_rank").cast("int").alias("mmr_rank"),
        "neighbor_id",
        F.col("rsim").alias("sim"),
    )


PCA_K = 4


@op("embed_pca_project", oracle=None)
def embed_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA over the embedding table, projecting every vector
    onto its top-4 principal components — the dimensionality-reduction /
    embedding-drift primitive (visualization grids, whitening before
    clustering, drift monitoring between corpus drops).

    Spark-first shape: the ONLY distributed work is a single
    ``mapInPandas`` pass emitting one (count, Σx, XᵀX) moment row per
    Arrow batch — numpy does each batch's d×d matmul, so the pass is one
    scan with O(d²) state per task and NO shuffle at all. The driver
    reduces the ≤#partitions moment rows (d + d² doubles each — metadata,
    not data), forms the covariance, runs a d×d ``eigh`` (64×64 here —
    microseconds; the d²-state design holds to d ≈ a few thousand, past
    which the scale path is randomized-SVD sketching), sign-canonicalizes
    each eigenvector (largest-|coeff| entry positive) so components are
    stable across eigensolver builds, and ships the d×4 loadings back as
    plan literals. Projection is a fixed-order zip_with/aggregate fold
    per component — map-side, deterministic.

    Oracle = ROWS (SURVEY §2.0 rule 5: eigendecomposition is not
    SQL-expressible). The invariant test pins run-stability, centered
    means, variance ordering by component, cross-component orthogonality,
    and agreement of each component's empirical variance with its
    eigenvalue."""
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir).embeddings.repartition(16, "vec_id")

    def moments(it):
        for pdf in it:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            yield pd.DataFrame(
                {"n": [len(X)], "s": [X.sum(0).tolist()], "xx": [(X.T @ X).ravel().tolist()]}
            )

    pf = e.select("embedding").mapInPandas(moments, "n long, s array<double>, xx array<double>")
    parts = pf.collect()
    n = sum(r["n"] for r in parts)
    d = len(parts[0]["s"])
    s = np.zeros(d)
    xx = np.zeros((d, d))
    for r in parts:
        s += np.asarray(r["s"])
        xx += np.asarray(r["xx"]).reshape(d, d)
    mu = s / n
    cov = (xx - n * np.outer(mu, mu)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:PCA_K]
    W = evecs[:, order]
    for j in range(W.shape[1]):
        i = int(np.argmax(np.abs(W[:, j])))
        if W[i, j] < 0:
            W[:, j] = -W[:, j]

    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))

    def proj(j):
        warr = F.array(*[F.lit(float(x)) for x in W[:, j]])
        mu_dot = float(mu @ W[:, j])
        return (
            F.aggregate(F.zip_with(v, warr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
            - F.lit(mu_dot)
        ).alias(f"pc{j + 1}")

    out = load(spark, sf_dir).embeddings
    return out.select(
        "vec_id",
        F.col("label").cast("int").alias("label"),
        *[proj(j) for j in range(PCA_K)],
    )


# The oracle's quantize+assign CTE chain, sliced from _ORACLE_IVF verbatim
# (string slice, not a copy — the two can never drift).
_IVF_ASSIGN_CTE_DUCK = _ORACLE_IVF[: _ORACLE_IVF.index(", probes AS")]


def _write_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Write the cell-partitioned IVF index to scratch; returns its path.
    Shared by sink_ivf_layout (rollup proof) and scan_ivf_probe (serving
    read path)."""
    from .scans import _scratch

    e = load(spark, sf_dir).embeddings
    assign = ivf_assign(e, label_centroids(e))
    idx = e.join(assign, "vec_id").select("vec_id", "embedding", "cell")
    path = _scratch("embeddings_ivf")
    (
        idx.repartition("cell")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    return path


@op(
    "sink_ivf_layout",
    oracle=_IVF_ASSIGN_CTE_DUCK
    + """
    SELECT CAST(a.cell AS BIGINT) AS cell,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(a.vec_id) AS BIGINT) AS vecid_sum,
           CAST(min(a.vec_id) AS BIGINT) AS vec_min,
           CAST(max(a.vec_id) AS BIGINT) AS vec_max
    FROM assign a GROUP BY a.cell
    """,
)
def sink_ivf_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted IVF index — the build-once/query-many half of the ANN
    story the in-memory sim_knn_ivf* ops leave implicit: every embedding
    is assigned to its nearest deterministic cell (label_centroids +
    ivf_assign — the sim_knn_ivf quantizer) and written CELL-PARTITIONED
    (``partitionBy(cell)``, vec_id-sorted within each cell) — the layout
    where a query's nprobe cells map to nprobe DIRECTORIES, so the serving
    scan reads only probed partitions (PartitionFilters — proved by
    tests/test_plans.py::test_ivf_layout_probe_prunes_partitions, the
    zorder/hilbert proof pattern applied to ANN). At 100 TB this is the
    difference between an ANN query touching nprobe/k of the index files
    and re-scanning the corpus; index freshness is the rebuild cadence.

    The readback rollup (per cell: count + exact vec_id checksum + id
    range) proves the write lossless cell by cell; the oracle recomputes
    the assignment algebraically (the _ORACLE_IVF CTE chain, sliced —
    shared text, zero drift)."""
    back = spark.read.parquet(_write_ivf_index(spark, sf_dir))
    return back.groupBy(F.col("cell").cast("bigint").alias("cell")).agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.sum("vec_id").cast("bigint").alias("vecid_sum"),
        F.min("vec_id").cast("bigint").alias("vec_min"),
        F.max("vec_id").cast("bigint").alias("vec_max"),
    )


_IVF_PROBE_SAMPLE_DUCK = (
    "instr('0123456789abcdef', substr(md5(CAST(p.vec_id AS VARCHAR)), 1, 1)) - 1 = 0"
)


@op(
    "scan_ivf_probe",
    oracle=_IVF_ASSIGN_CTE_DUCK
    + f"""
    , probes AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn FROM vc
      ) WHERE rn <= 2
    ), cand AS (
      SELECT p.vec_id AS vec_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.vec_id
      WHERE {_IVF_PROBE_SAMPLE_DUCK}
    ), scored AS (
      SELECT c.vec_id, c.neighbor_id,
             list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) / (a.nrm * b.nrm) AS sim
      FROM cand c JOIN vn a ON a.vec_id = c.vec_id JOIN vn b ON b.vec_id = c.neighbor_id
    )
    SELECT vec_id, neighbor_id, round(sim, 4) AS sim FROM (
      SELECT vec_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def scan_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN serving from the PERSISTED index — the query-many half of
    sink_ivf_layout: a deterministic query sample (first md5 nibble of
    vec_id = 0, the doc_train_split convention — a serving op answers a
    query workload, not the whole corpus) scores the broadcast centroids
    for its 2 nearest cells, then candidate NEIGHBOR vectors come from the
    cell-partitioned parquet index (the hash join on cell touches only
    probed cells' data; the static-probe pruning proof is the plan test on
    the sink). Exact cosine rescore — same fold summation order as the
    oracle — top-5 per query. Identical math to sim_knn_ivf with one
    difference that IS the point: neighbors are read from storage, not
    recomputed — the build-once/query-many topology an ANN service runs.

    Scale: query-side work is O(sample × nprobe × cell width); the index
    scan reads only probed cells; centroids stay a broadcast literal.
    MEASURED WALL (r9 ladder): with the LABEL quantizer the cell count is
    fixed (~10 at any scale), so cell width — and the candidate join
    carrying 64-double arrays — grows linearly: the 100× replica's probe
    (12.5k queries × 2 cells × 20k-wide cells ≈ 500M fold rows) exceeded
    the 10-minute ladder budget, while the sink build stayed 11.9 s. This
    is the same fixed-k wall the env-tunable kmeans quantizer exists for:
    a deployment probes a √n-cell kmeans index (UP_IVF_KMEANS_K) through
    sim_knn_ivf_kmeans's per-cell cogroup-matmul kernel over this SAME
    persisted layout; the label-quantizer form here is the oracle-EXACT
    contract of the read path, sized for query workloads over
    fixed-cardinality cells."""
    e = load(spark, sf_dir).embeddings
    cent = label_centroids(e)
    back = spark.read.parquet(_write_ivf_index(spark, sf_dir))
    return _ivf_serve_probe(e, cent, back)


def _ivf_serve_probe(e: DataFrame, cent: DataFrame, back: DataFrame) -> DataFrame:
    """The label-quantizer serving-probe plan, shared by scan_ivf_probe,
    scan_ivf_probe_filtered and the append probe-agreement test: the
    md5-sampled query workload of ``e`` scores the broadcast ``cent``
    frame for its 2 nearest cells; candidate neighbors come from ``back``
    (a (vec_id, embedding, cell) member frame — the persisted index
    readback, optionally pre-filtered); exact cosine rescore, top-5 per
    query on (sim desc, neighbor_id asc). Any member-side predicate a
    caller applies to ``back`` sits BELOW this rescore by construction,
    so k is maintained over survivors. Query-side cell ranking goes
    through the shared _cell_scores kernel."""
    from .curation import HEX

    agg_sum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sample = (
        F.instr(F.lit(HEX), F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1)) - 1 == 0
    )
    q = e.where(sample)
    qn = _norm_vectors(q)
    probes = (
        _cell_scores(q, cent)
        .where(F.col("crank") <= 2)
        .select("vec_id", F.col("cell").cast("bigint").alias("cell"))
    )
    nb = back.select(
        F.col("cell").cast("bigint").alias("cell"),
        F.col("vec_id").alias("neighbor_id"),
        v.alias("nv"),
    ).withColumn("nnrm", F.sqrt(agg_sum(F.transform(F.col("nv"), lambda x: x * x))))
    cand = probes.join(nb, "cell").where(F.col("neighbor_id") != F.col("vec_id"))
    scored = cand.join(qn.select(F.col("vec_id"), F.col("v"), F.col("nrm")), "vec_id").select(
        "vec_id",
        "neighbor_id",
        (
            agg_sum(F.zip_with(F.col("v"), F.col("nv"), lambda x, y: x * y))
            / (F.col("nrm") * F.col("nnrm"))
        ).alias("sim"),
    )
    w_rank = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= 5)
        .select("vec_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


def _probe_cells_ranked(
    qn: DataFrame, cent: DataFrame | _CentroidModel, nprobe: int = _IVF_NPROBE, normalize: bool = False
) -> DataFrame:
    """(cell, vec_id, u, rn): each query's ``nprobe`` nearest quantizer
    cells by centroid cosine (csim desc, cell asc tie-break), rn = 1-based
    probe rank — THE probe-side scoring of the trained-quantizer family.

    r14 optimization (guide §2.4 + §4.2): the r13 form exploded every
    query into k crossJoin rows, evaluated an INTERPRETED zip_with/
    aggregate fold per (query, cell), then shuffled all n·k rows — each
    carrying the 64-double ``u`` array — by vec_id for a row_number window
    that kept nprobe of them (r14 profile: two ~0.8 s 32-task fold stages
    plus a window stage per bench run of q_ivf at sf0.1). Top-nprobe of a
    per-ROW score needs no window and no exchange at all: the centroids
    are k ≈ √n rows of model metadata (the same boundedness argument as
    the PQ codebooks), so they collect to the driver once and every Arrow
    batch scores against them as ONE numpy matmul, emitting the nprobe
    winners map-side. Zero shuffles where there were one exchange + one
    n·k-row sort; the fold lambdas are gone.

    csim itself is never an output column — only the resulting cell
    choices — so the matmul's last-ulp summation-order difference from
    the old fold can only matter on exact centroid-score ties, which the
    (csim desc, cell asc) lexsort breaks identically. ``u`` passes
    through byte-identical (normalization stays in _unit_embeddings,
    whose fold order the EXACT oracles reproduce).

    One body so build-assignment (nprobe=1 via _kmeans_assign),
    raw-vector serving (_kmeans_serve) and compressed serving
    (_ivfpq_serve) cannot drift."""
    import numpy as np

    # the centroid rows are model metadata (k ≈ √n): reuse the driver-side
    # copy a fresh _CentroidModel carries, else (centroids read back from a
    # persisted index) one bounded collect.
    if isinstance(cent, _CentroidModel):
        crows = cent.rows
    else:
        crows = [(r["cell"], r["c"], r["cnrm"]) for r in cent.select("cell", "c", "cnrm").collect()]  # bounded: <= quantizer-cell-count centroid rows (model metadata)
    crows = sorted(crows, key=lambda r: r[0])
    cells = np.array([r[0] for r in crows], dtype=np.int32)
    cmat = np.array([list(r[1]) for r in crows], dtype=np.float64)
    cnrm = np.array([r[2] for r in crows], dtype=np.float64)
    take = min(nprobe, len(crows))

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            if normalize:
                # fused _unit_embeddings (bit-identical: cumsum is the
                # sequential fold) — one Python hop instead of two
                v = np.array(pdf["embedding"].tolist(), dtype=np.float64)
                u_mat = _np_unit(v)
                u_col = list(u_mat)
            else:
                u_col = pdf["u"]
                u_mat = np.array(u_col.tolist(), dtype=np.float64)
            csim = (u_mat @ cmat.T) / cnrm[None, :]
            # cells are ascending (sorted crows), so (csim desc, cell asc)
            # == the bounded exact top-k's lower-column tie-break
            order = _topk_cols_exact(np, csim, take)
            rep = np.repeat(np.arange(n), take)
            yield pd.DataFrame(
                {
                    "cell": cells[order].ravel(),
                    "vec_id": pdf["vec_id"].to_numpy(np.int64)[rep],
                    "u": [u_col[i] for i in rep] if normalize else list(u_col.iloc[rep]),
                    "rn": np.tile(np.arange(1, take + 1, dtype=np.int32), n),
                }
            )

    src = qn.select("vec_id", "embedding") if normalize else qn.select("vec_id", "u")
    return src.mapInPandas(gen, "cell int, vec_id long, u array<double>, rn int")


def _probe_cells(qn: DataFrame, cent: DataFrame | _CentroidModel, nprobe: int = _IVF_NPROBE) -> DataFrame:
    """(cell, vec_id, u): _probe_cells_ranked without the rank column —
    the serving-probe shape (_kmeans_serve / _ivfpq_serve)."""
    return _probe_cells_ranked(qn, cent, nprobe).select("cell", "vec_id", "u")


def _kmeans_assign(unit: DataFrame, cent: DataFrame | _CentroidModel) -> DataFrame:
    """(vec_id, u, cell): nearest-centroid assignment of unit vectors
    against a broadcast kmeans centroid frame — csim desc, cell asc,
    keep rank 1. THE assignment expression of the kmeans-quantizer
    family: the index build and the append's frozen-quantizer assignment
    route through this one body so they cannot drift (the _cell_scores
    consolidation discipline, applied to the trained quantizer)."""
    return _probe_cells(unit, cent, nprobe=1).select("vec_id", "u", "cell")


def _write_ivf_kmeans_index(
    spark: SparkSession, sf_dir: str, max_vec_id: int | None = None, root_name: str = "embeddings_ivf_kmeans"
) -> str:
    """Write the DEPLOYMENT-quantizer serving index: trained √n-style
    kmeans centroids persisted NEXT TO the cell-partitioned unit-vector
    members (an index that does not ship its quantizer cannot be probed
    by a fresh process). Returns the index root; layout:

      <root>/centroids/   (cell, c, cnrm)           — k x dim, one file
      <root>/cells/       partitionBy(cell) parquet  (vec_id, u)

    ``max_vec_id`` restricts the build (and the quantizer TRAINING) to a
    base-corpus prefix — the sink_ivf_append_kmeans convention, where
    appended vectors must land in existing cells of a frozen quantizer.
    Shared build for scan_ivf_probe_kmeans; the label-quantizer sibling
    sink_ivf_layout keeps the EXACT-oracle contract of the write path."""
    from .scans import _scratch

    # Same lineage as sim_knn_ivf_kmeans (repartition(embed_partitions, vec_id) BEFORE
    # normalization): k-means|| init samples per partition, so the trained
    # centers are only bit-identical across the in-memory sibling and this
    # persisted build when both train over the same partitioning.
    e = load(spark, sf_dir).embeddings.repartition(embed_partitions(spark), "vec_id")
    if max_vec_id is not None:
        e = e.where(F.col("vec_id") <= max_vec_id)
    unit = _unit_embeddings(e)
    cent = _kmeans_cells(spark, unit, raw=e)
    assign = _kmeans_assign(unit, cent)
    root = _scratch(root_name)
    cent.df.write.mode("overwrite").parquet(os.path.join(root, "centroids"))
    # lang rides NEXT TO each member (vec_id = doc_id, 1:1 — ENFORCED by
    # _join_doc_meta_1to1's raise_error gate) so attribute-predicated
    # serving (scan_ivf_probe_kmeans_filtered) is a parquet pushdown on
    # the member scan, not a serve-time metadata join.
    (
        _join_doc_meta_1to1(
            assign.select("vec_id", "u", "cell"), load(spark, sf_dir).documents, ["lang"]
        )
        .select("vec_id", "u", "lang", "cell")
        .repartition("cell")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(root, "cells"))
    )
    return root


@op("scan_ivf_probe_kmeans", oracle=None)
def scan_ivf_probe_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN serving from the persisted KMEANS-quantized index — the
    deployment form of scan_ivf_probe (VERDICT r9 "What's wrong" #2):
    the label-quantizer probe is the oracle-EXACT contract of the read
    path but its FIXED cell count makes cell width linear in corpus size;
    this op grades the form a 100 TB deployment actually runs — an
    env-tunable √n-cell trained quantizer (UP_IVF_KMEANS_K) whose
    candidates/query ≈ nprobe·(n/k) stays bounded as k grows with n.

    Topology: centroids are READ from the index (the quantizer ships with
    it — no retraining at serve time), the md5-sampled query workload
    (first nibble = 0 — the scan_ivf_probe convention) scores the
    broadcast centroid frame for its 2 nearest cells, the probed-cell SET
    (≤ k cell ids — a bounded metadata collect) becomes a static
    partition filter on the cell-partitioned parquet — the serving scan
    READS ONLY PROBED PARTITIONS (PartitionFilters, proved by
    tests/test_plans.py::test_ivf_kmeans_probe_prunes_partitions) — and
    the within-cell rescore is the per-cell cogroup matmul kernel
    (_cell_matmul_rescore), not the pair-join fold that ships 64-double
    arrays into every candidate row.

    Oracle = ROWS (SURVEY §2.0 rule 5): the trained quantizer isn't
    SQL-expressible; determinism comes from the fixed seed + lexsort
    relabeling, and quality from the recall@5 gate
    (tests/test_invariants.py::test_ivf_kmeans_probe_recall_and_determinism)
    against the exact blocked kNN restricted to the same query sample."""
    return _kmeans_serve(spark, sf_dir, member_pred=None)


@op("scan_ivf_probe_kmeans_filtered", oracle=None)
def scan_ivf_probe_kmeans_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED ANN serving on the DEPLOYMENT quantizer — the composition
    of scan_ivf_probe_filtered's semantics (attribute predicate below the
    rescore, k maintained over survivors) with scan_ivf_probe_kmeans's
    scale shape (√n trained cells, static-partition-filtered member scan,
    per-cell cogroup matmul). The label-quantizer filtered probe is the
    EXACT-oracle contract of the semantics; THIS is the form a 100 TB
    retrieval stack runs, because its candidate width stays bounded as
    the corpus grows.

    The lang column rides in the persisted cells (written next to each
    member by _write_ivf_kmeans_index), so the predicate is a parquet
    data-column pushdown on only the probed partitions — both pruning
    layers stack: PartitionFilters on cell, PushedFilters on lang.

    Oracle = ROWS (trained quantizer); gated by
    tests/test_invariants.py::test_kmeans_filtered_probe_semantics —
    every neighbor satisfies the predicate, en survivors of the
    unfiltered top-5 are retained (monotonicity), and at least one query
    back-fills (the post-filter-cannot-produce row)."""
    return _kmeans_serve(spark, sf_dir, member_pred=F.col("lang") == _FILTERED_LANG)


def _mask_live_tombstones(spark: SparkSession, root: str, df: DataFrame) -> DataFrame:
    """SERVING-side half of the delete family's tombstone contract: when
    an un-retired erasure manifest (``<root>/tombstones`` with parquet
    _SUCCESS) sits next to the index, anti-join it out of the member/code
    frame — erased ids stop appearing the moment the manifest lands, and
    every intermediate purge state (crash after the partial rewrite,
    before the manifest retires to ``tombstones_applied``) still serves
    correctly. The manifest is one erasure REQUEST (≤ IVF_ERASE_N rows —
    fixed size by contract, never corpus-sized), so the anti-join is a
    broadcast no-shuffle prune. A retired manifest means the purge
    committed — nothing to mask. Closes ADVICE r13 #1: the delete
    docstrings promised this join; now the serve paths implement it
    (pinned by tests/test_invariants.py::test_serving_masks_live_tombstones)."""
    ts = os.path.join(root, "tombstones")
    if os.path.exists(os.path.join(ts, "_SUCCESS")):
        live = spark.read.parquet(ts).select("vec_id")
        return df.join(F.broadcast(live), "vec_id", "left_anti")
    return df


def _kmeans_serve(
    spark: SparkSession, sf_dir: str, member_pred, root: str | None = None
) -> DataFrame:
    """Shared kmeans-index serving body: build/read the persisted index,
    score the md5-sampled query workload against the shipped centroids,
    static-partition-filter the member scan to the probed cells, mask any
    live tombstone manifest (_mask_live_tombstones), apply an optional
    member predicate (below the rescore), cogroup-matmul top-5.
    ``root`` serves an EXISTING index (the mid-delete test path and the
    deployment shape — build once, probe many); None builds fresh. Serving
    an existing root first rolls any interrupted retrain cutover forward
    (_retrain_recover) — the probe-continuity half of sink_ivf_retrain's
    contract: every serve call answers from a consistent generation."""
    if root is None:
        root = _write_ivf_kmeans_index(spark, sf_dir)
    else:
        _retrain_recover(root)
    cent = spark.read.parquet(os.path.join(root, "centroids"))
    from .curation import HEX

    e = load(spark, sf_dir).embeddings
    sample = (
        F.instr(F.lit(HEX), F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1)) - 1 == 0
    )
    qn = _unit_embeddings(e.where(sample))
    probes = _probe_cells(qn, cent)
    # Probed-cell set as a STATIC partition filter: <= k cell ids (cell
    # cardinality is the quantizer's k, never data volume) — the bounded
    # metadata collect that turns the serving scan into a
    # probed-partitions-only read instead of a full-index shuffle.
    probed = [r["cell"] for r in probes.select("cell").distinct().collect()]
    members = _mask_live_tombstones(
        spark,
        root,
        spark.read.parquet(os.path.join(root, "cells")).where(F.col("cell").isin(probed)),
    )
    if member_pred is not None:
        members = members.where(member_pred)
    members = members.select(
        F.col("cell").alias("mcell"),
        F.col("vec_id").alias("mvec_id"),
        F.col("u").alias("mu"),
    )
    return _cogroup_topk(probes, members)


# Signed feature hashing (the "hashing trick", Weinberger et al. 2009):
# the text → embedding producer for when no neural encoder is available —
# the step that MAKES the embedding column the sim_*/dedup_embed_* family
# consumes. Dimensions/sign come from md5 nibbles (the repo's engine-
# neutral hash discipline), weights are TF-IDF.
HASH_EMBED_DIM = 64


def _nib_sql(h: str, i: int) -> str:
    """i-th md5 hex nibble (1-based) as an int — identical text both engines."""
    from .curation import HEX

    return f"(instr('{HEX}', substr({h}, {i}, 1)) - 1)"


@op(
    "embed_hash_tfidf",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM tok WHERE token <> '' GROUP BY doc_id, token
    ), df AS (
      SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token
    ), n AS (SELECT count(*) AS n FROM documents),
    w AS (
      SELECT tf.doc_id,
             ({_nib_sql("md5(tf.token)", 1)} * 16 + {_nib_sql("md5(tf.token)", 2)}) % {HASH_EMBED_DIM} AS dim,
             (CASE WHEN {_nib_sql("md5(tf.token)", 3)} < 8 THEN 1 ELSE -1 END)
               * CAST(round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) * 10000) AS BIGINT) AS w_int
      FROM tf JOIN df USING (token) CROSS JOIN n
    ), v AS (
      SELECT doc_id, dim, CAST(sum(w_int) AS BIGINT) AS v_int
      FROM w GROUP BY doc_id, dim
    ), nrm AS (
      SELECT doc_id, sum(v_int * v_int) AS n2 FROM v GROUP BY doc_id
    )
    SELECT v.doc_id, CAST(v.dim AS INT) AS dim,
           round(CAST(v.v_int AS DOUBLE) / sqrt(CAST(nrm.n2 AS DOUBLE)), 6) AS val
    FROM v JOIN nrm USING (doc_id)
    WHERE v.v_int <> 0
    """,
)
def embed_hash_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text → embedding via SIGNED FEATURE HASHING over TF-IDF weights —
    the producer side of the embedding column every sim_*/dedup_embed_*
    op consumes (the fixture ships embeddings ready-made; a real pipeline
    has to make them, and the hashing trick is the model-free way: each
    token hashes to one of 64 dimensions with a ±1 sign, weights are
    tf·idf, vectors L2-normalize — sparse, streaming-friendly, and
    vocabulary-unbounded because the projection IS the hash).

    Determinism is engineered so the whole op is EXACT-oracled despite
    floating-point: each token's tf·idf addend is rounded ONCE to a
    scaled BIGINT (×10⁴), so per-dimension accumulation and the squared
    norm are exact integer sums — no summation-order hazard anywhere; the
    single double division happens after all aggregation and is rounded
    to 6 dp (the graph_pagerank last-ulp argument). Output is the sparse
    long form (doc_id, dim, val) — the layout a 100 TB embedding job
    writes anyway (arrays ship poorly through engines' hash gates).

    Scale: one corpus scan+explode (tf), df as a window over the compact
    (doc, token, tf) frame (the text_tfidf single-scan discipline), then
    two shuffles over sparse (doc, dim) rows — ≤ 64/doc."""
    from pyspark.sql import Window

    from .llm_text import _tokens

    d = load(spark, sf_dir).documents
    tf = _tokens(d).groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    w_tok = Window.partitionBy("token")
    n = d.agg(F.count("*").alias("n"))
    h = "md5(token)"
    weighted = (
        tf.withColumn("df", F.count("*").over(w_tok))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.expr(
                f"({_nib_sql(h, 1)} * 16 + {_nib_sql(h, 2)}) % {HASH_EMBED_DIM}"
            ).alias("dim"),
            (
                F.expr(f"CASE WHEN {_nib_sql(h, 3)} < 8 THEN 1 ELSE -1 END")
                * F.expr(
                    "CAST(round(tf * ln(CAST(n AS DOUBLE) / df) * 10000) AS BIGINT)"
                )
            ).alias("w_int"),
        )
    )
    v = weighted.groupBy("doc_id", "dim").agg(F.sum("w_int").cast("bigint").alias("v_int"))
    w_doc = Window.partitionBy("doc_id")
    return (
        v.withColumn("n2", F.sum(F.col("v_int") * F.col("v_int")).over(w_doc))
        .where(F.col("v_int") != 0)
        .select(
            "doc_id",
            F.col("dim").cast("int").alias("dim"),
            F.round(
                F.col("v_int").cast("double") / F.sqrt(F.col("n2").cast("double")), 6
            ).alias("val"),
        )
    )


@op("sim_knn_ivf_pq", oracle=None)
def sim_knn_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ — the two ANN compressions COMPOSED, which is the form a
    production vector index actually runs (FAISS ``IVFx,PQy``): the
    trained kmeans cells bound WHICH vectors a query scans
    (candidates/query ≈ nprobe·(n/k), the IVF half), and product
    quantization bounds the BYTES each scanned vector costs (8 B/vector
    ADC codes, the PQ half) — at 100 TB neither alone suffices: IVF with
    raw vectors still reads 512 B/candidate; PQ alone still scans every
    code. Search: per probed cell, a cogroup ADC kernel gathers each
    query's 8 table lookups per member code and keeps PQ_CAND
    candidates; cells merge under a global top-PQ_CAND window; the final
    top-5 is an EXACT cosine rescore of candidates only (the
    sim_knn_lsh/ivf/pq rescore discipline, shared _exact_rescore fold).

    Oracle = ROWS (trained quantizer + codebooks); determinism from the
    fixed seeds + data-order Lloyd's + lexsort tie-breaks, quality from
    the recall@5 gate
    (tests/test_invariants.py::test_ivf_pq_recall_and_determinism).

    Scale: quantizer + codebooks train on bounded samples; assignment and
    encoding touch each vector once; the ADC scan shuffles each CODE (not
    vector) once by cell id; per-task transients stay tiled."""
    e = load(spark, sf_dir).embeddings.repartition(embed_partitions(spark), "vec_id")
    unit = _unit_embeddings(e)
    cent = _kmeans_cells(spark, unit, raw=e)
    books = _pq_codebooks(unit, raw=e)
    codes = unit.mapInPandas(_pq_encode(books), "vec_id long, code long")

    agg_sum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    vc = unit.crossJoin(F.broadcast(cent.df)).select(
        "vec_id",
        "u",
        "cell",
        (agg_sum(F.zip_with(F.col("u"), F.col("c"), lambda x, y: x * y)) / F.col("cnrm")).alias(
            "csim"
        ),
    )
    w_cell = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cell").asc())
    ranked = vc.withColumn("rn", F.row_number().over(w_cell))
    members = (
        ranked.where(F.col("rn") == 1)
        .select(F.col("cell").alias("mcell"), F.col("vec_id").alias("mvec_id"))
        .join(codes.select(F.col("vec_id").alias("mvec_id"), "code"), "mvec_id")
    )
    probes = ranked.where(F.col("rn") <= _IVF_NPROBE).select("cell", "vec_id", "u")
    return _ivfpq_search(e, probes, members, books)


def _adc_cell_kernel(books):
    """Per-probed-cell cogroup ADC kernel factory: members arrive as 8 B
    packed codes, each query gathers its PQ_M precomputed table lookups
    per member code (no decompression), keeps its per-cell top-PQ_CAND.
    Codebooks travel in the task closure (1024 doubles). Query rows tile
    to ≤ KNN_TILE_ELEMS sims elements so a hot cell cannot blow a task's
    memory. Shared by sim_knn_ivf_pq (in-memory) and scan_ivfpq_probe
    (persisted composed index) so the composed search cannot drift."""
    import numpy as np

    def adc_cell(key, probes_pdf, members_pdf):
        import pandas as pd

        if len(probes_pdf) == 0 or len(members_pdf) == 0:
            return pd.DataFrame({"vec_id": [], "neighbor_id": [], "asim": []}).astype(
                {"vec_id": "int64", "neighbor_id": "int64", "asim": "float64"}
            )
        qids = probes_pdf["vec_id"].to_numpy(np.int64)
        mids = members_pdf["mvec_id"].to_numpy(np.int64)
        packed = members_pdf["code"].to_numpy(np.int64)
        mcodes = np.stack(
            [((packed >> (4 * m)) & 0xF) for m in range(PQ_M)], axis=1
        ).astype(np.uint8)
        Q = np.array(probes_pdf["u"].tolist(), dtype=np.float64)
        Tq = np.einsum("bsd,skd->bsk", Q.reshape(len(Q), PQ_M, PQ_SUBDIM), books)
        rows_per_tile = max(1, KNN_TILE_ELEMS // max(1, len(mids)))
        out = []
        for lo in range(0, len(qids), rows_per_tile):
            T = Tq[lo : lo + rows_per_tile]
            sims = np.zeros((len(T), len(mids)))
            for m in range(PQ_M):
                sims += T[:, m, :][:, mcodes[:, m]]
            sims[qids[lo : lo + rows_per_tile, None] == mids[None, :]] = -np.inf
            k = min(PQ_CAND, sims.shape[1])
            top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
            sel = np.take_along_axis(sims, top, axis=1)
            keep = np.isfinite(sel)
            out.append(
                pd.DataFrame(
                    {
                        "vec_id": np.repeat(qids[lo : lo + rows_per_tile], k)[keep.ravel()],
                        "neighbor_id": mids[top].ravel()[keep.ravel()],
                        "asim": sel.ravel()[keep.ravel()],
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return adc_cell


def _ivfpq_search(e: DataFrame, probes: DataFrame, members: DataFrame, books) -> DataFrame:
    """The composed IVF+PQ search finishing: cell-cogrouped ADC candidate
    stage (_adc_cell_kernel), global top-PQ_CAND merge window, EXACT
    cosine rescore of candidates only (the sim_knn_lsh/ivf/pq rescore
    discipline, shared _exact_rescore fold), final top-5."""
    per_cell = (
        probes.groupBy("cell")
        .cogroup(members.groupBy("mcell"))
        .applyInPandas(_adc_cell_kernel(books), "vec_id long, neighbor_id long, asim double")
    )
    w_cand = Window.partitionBy("vec_id").orderBy(F.col("asim").desc(), F.col("neighbor_id").asc())
    cand = (
        per_cell.withColumn("rn", F.row_number().over(w_cand))
        .where(F.col("rn") <= PQ_CAND)
        .select("vec_id", "neighbor_id")
    )
    w_rank = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        _exact_rescore(e, cand)
        .withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= 5)
        .select("vec_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


def _write_pq_index(spark: SparkSession, sf_dir: str) -> str:
    """Write the persisted PQ index: the 8 B/vector code table (vec_id-
    sorted parquet — the chunk fetches push vec_id ranges into row-group
    stats) NEXT TO its codebooks (an index without its codebooks cannot
    be scanned). Layout:

      <root>/codebooks/  (sub, cent, dim, w)   — PQ_M·PQ_K·PQ_SUBDIM rows
      <root>/codes/      (vec_id, code)         — one long per vector
    """
    from .scans import _scratch

    e = load(spark, sf_dir).embeddings
    unit = _unit_embeddings(e)
    books = _pq_codebooks(unit, raw=e)
    root = _scratch("embeddings_pq")
    _write_books_frame(spark, books, os.path.join(root, "codebooks"))
    (
        unit.mapInPandas(_pq_encode(books), "vec_id long, code long")
        .repartitionByRange(8, "vec_id")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .parquet(os.path.join(root, "codes"))
    )
    return root


@op("scan_pq_probe", oracle=None)
def scan_pq_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN serving from the persisted PQ index — the memory-bound member
    of the build-once/query-many family (sink_ivf_layout/scan_ivf_probe*
    persist the cell topology; THIS persists the 8 B/vector compressed
    form: a 1e9-vector corpus is an ~8 GB code table on disk, scanned in
    4 MB broadcast chunks). Codebooks are READ FROM THE INDEX (bit-exact
    roundtrip asserted in the invariant test — no retraining at serve
    time), the md5-sampled query workload (first nibble = 0, the serving
    convention) runs the same factored ADC scan + exact-rescore as
    sim_knn_pq, and only candidates pay the full-precision join.

    Oracle = ROWS (trained codebooks); gated by
    tests/test_invariants.py::test_pq_probe_recall_and_roundtrip —
    run-stability, 5 real-cosine neighbors per sampled query, recall@5
    ≥ the sim_knn_pq floor on the same sample, codebook roundtrip
    bit-exactness."""
    root = _write_pq_index(spark, sf_dir)
    return _pq_probe_from_root(spark, sf_dir, root)


def _read_codebooks(spark: SparkSession, root: str):
    """The PQ quantizer readback — persisted codebooks into the
    (PQ_M, PQ_K, PQ_SUBDIM) numpy array every encode/ADC kernel ships
    (model metadata: PQ_M·PQ_K·PQ_SUBDIM rows, never data volume). One
    body for every serve/append/compact/stream site, so the readback
    convention cannot drift."""
    import numpy as np

    bk = spark.read.parquet(os.path.join(root, "codebooks")).collect()  # PQ_M*PQ_K*PQ_SUBDIM rows (model metadata)
    books = np.zeros((PQ_M, PQ_K, PQ_SUBDIM))
    for r in bk:
        books[r.sub, r.cent, r.dim] = r.w
    return books


def _pq_probe_from_root(
    spark: SparkSession, sf_dir: str, root: str, member_pred=None
) -> DataFrame:
    """Shared PQ-index serving body (scan_pq_probe / scan_pq_probe_filtered,
    and the deployment shape — build once, probe many): codebooks read
    back from the index, live tombstone manifest masked out of the code
    table (_mask_live_tombstones — erased vectors stop scoring before any
    purge rewrites), optional attribute predicate pruned at the code-table
    scan, then the factored ADC scan + exact rescore over the md5-sampled
    query workload. The recover preamble first rolls any interrupted
    codebook-retrain cutover forward (sink_pq_retrain's probe-continuity
    half, mirroring _kmeans_serve)."""
    from .curation import HEX

    _retrain_recover(root, "codebooks", "codes", "codebooks_retired")
    books = _read_codebooks(spark, root)
    codes = spark.read.parquet(os.path.join(root, "codes"))
    if member_pred is not None:
        codes = codes.where(member_pred)
    codes = _mask_live_tombstones(spark, root, codes).select("vec_id", "code")
    e = load(spark, sf_dir).embeddings
    sample = (
        F.instr(F.lit(HEX), F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1)) - 1 == 0
    )
    queries = _unit_embeddings(e.where(sample))
    return _pq_adc_search(spark, e, queries, codes, books)


def _pq_append_parts(spark: SparkSession, sf_dir: str):
    """(index_root, cutoff): build the BASE PQ index — codebooks trained
    on the base corpus (vec_id <= the 0.8-quantile cutoff, the
    incremental-maintenance split convention shared with
    _ivf_append_parts / dedup_incremental) and the base code table.
    The append step encodes new vectors against these FROZEN books."""
    from .scans import _scratch

    e = load(spark, sf_dir).embeddings
    cutoff = e.agg(
        F.floor(F.lit(0.8) * F.max("vec_id")).cast("bigint").alias("c")
    ).collect()[0]["c"]
    base = e.where(F.col("vec_id") <= cutoff)
    books = _pq_codebooks(_unit_embeddings(base), raw=base)
    root = _scratch("embeddings_pq_incr")
    _write_books_frame(spark, books, os.path.join(root, "codebooks"))
    (
        _unit_embeddings(base)
        .mapInPandas(_pq_encode(books), "vec_id long, code long")
        .repartitionByRange(8, "vec_id")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .parquet(os.path.join(root, "codes"))
    )
    return root, cutoff


def _pq_append_codes(spark: SparkSession, sf_dir: str, root: str, cutoff: int) -> None:
    """The frozen-book batch append, factored: encode the post-cutoff
    vectors with the codebooks READ BACK FROM THE INDEX and append the new
    code files — O(batch), base files untouched. Shared by sink_pq_append
    and sink_pq_retrain's drift-accumulation phase."""
    books = _read_codebooks(spark, root)
    e = load(spark, sf_dir).embeddings
    new = e.where(F.col("vec_id") > cutoff)
    (
        _unit_embeddings(new)
        .mapInPandas(_pq_encode(books), "vec_id long, code long")
        .repartitionByRange(2, "vec_id")
        .sortWithinPartitions("vec_id")
        .write.mode("append")
        .parquet(os.path.join(root, "codes"))
    )


@op(
    "sink_pq_append",
    oracle="""
    WITH cut AS (SELECT CAST(floor(0.8 * max(vec_id)) AS BIGINT) AS c FROM embeddings)
    SELECT CASE WHEN e.vec_id <= cut.c THEN 'base' ELSE 'appended' END AS part,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(e.vec_id) AS BIGINT) AS vecid_sum,
           CAST(min(e.vec_id) AS BIGINT) AS vec_min,
           CAST(max(e.vec_id) AS BIGINT) AS vec_max
    FROM embeddings e CROSS JOIN cut GROUP BY 1
    """,
)
def sink_pq_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental PQ encode — the PQ twin of sink_ivf_append (r11
    VERDICT missing #3): a daily crawl's new vectors (vec_id above the
    0.8-quantile cutoff) are encoded with the FROZEN codebooks READ BACK
    FROM THE INDEX (the scan_pq_probe serve-path convention — the encoder
    a fresh process runs is the persisted quantizer, not a retrain) and
    appended to the code table, O(batch): one Arrow mapInPandas pass over
    the new vectors, new parquet files only, base code files untouched.

    Why this is the 100 TB form: re-encoding a 1e9-vector corpus to
    refresh an 8 GB code table costs a full corpus pass; the append
    costs one day's vectors. Codebook drift against the growing corpus
    is absorbed by the periodic rebuild cadence (_write_pq_index), same
    as the IVF quantizer.

    The readback rollup is count/checksum-shaped — code VALUES are
    trained-model output (ROWS territory), but row provenance is not:
    every vector contributes exactly one code row, so (part, n_vecs,
    vecid_sum, id range) is EXACT-oracled against the raw table. The
    model-side claims — appending leaves base codes and codebooks
    bit-identical, frozen-book encoding equals direct encoding, new
    vectors reachable by the ADC search — are pinned by
    tests/test_invariants.py::test_pq_append_frozen_books_and_reachability."""
    root, cutoff = _pq_append_parts(spark, sf_dir)
    _pq_append_codes(spark, sf_dir, root, cutoff)
    codes = spark.read.parquet(os.path.join(root, "codes"))
    return codes.groupBy(
        F.when(F.col("vec_id") <= cutoff, "base").otherwise("appended").alias("part")
    ).agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.sum("vec_id").cast("bigint").alias("vecid_sum"),
        F.min("vec_id").cast("bigint").alias("vec_min"),
        F.max("vec_id").cast("bigint").alias("vec_max"),
    )


# ---------------------------------------------------------------------------
# Filtered ANN serving + incremental index maintenance (VERDICT r10 missing
# #1 and #2): the two gaps between "an index exists" and "an index a
# production retrieval stack can run" — attribute-predicated search and
# daily-crawl appends without a rebuild.


def _join_doc_meta_1to1(members: DataFrame, docs: DataFrame, cols: list) -> DataFrame:
    """LEFT-join documents metadata onto index members with the assumed
    1:1 vec_id = doc_id contract ENFORCED (r11 ADVICE #1): the former
    inner join silently DROPPED embeddings without a documents row
    (changing pre-existing probe results) and would DUPLICATE index
    members on a duplicate doc_id. Either violation now raises at build
    time: the grouped meta side carries its per-key row count, and every
    metadata column is selected through a count==1 gate whose else
    branch is raise_error — evaluated inside the write job (a left-join
    null makes the gate false too), no extra driver action."""
    meta = docs.groupBy(F.col("doc_id").alias("vec_id")).agg(
        *[F.max(c).alias(c) for c in cols], F.count("*").alias("_n")
    )
    ok = F.col("_n") == 1
    checked = [
        F.when(ok, F.col(c))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "index meta join: documents contract violated "
                        "(missing or duplicate doc row) for vec_id="
                    ),
                    F.col("vec_id").cast("string"),
                )
            )
        )
        .alias(c)
        for c in cols
    ]
    return members.join(meta, "vec_id", "left").select(*members.columns, *checked)


def _write_ivf_meta_index(spark: SparkSession, sf_dir: str) -> str:
    """Write the cell-partitioned IVF index WITH filterable metadata
    columns (lang, source — joined from documents on vec_id = doc_id):
    the layout where an attribute predicate is answerable INSIDE the
    member scan (parquet row-group PushedFilters) instead of by a
    post-scan join against the metadata table. At 100 TB the difference
    is a predicate evaluated on min/max-pruned column chunks of only the
    probed cells vs shipping every probed member through a second join.
    Shared by scan_ivf_probe_filtered."""
    from .scans import _scratch

    t = load(spark, sf_dir)
    e = t.embeddings
    assign = ivf_assign(e, label_centroids(e))
    idx = _join_doc_meta_1to1(
        e.join(assign, "vec_id").select("vec_id", "embedding", "cell"),
        t.documents,
        ["lang", "source"],
    ).select("vec_id", "embedding", "lang", "source", "cell")
    path = _scratch("embeddings_ivf_meta")
    (
        idx.repartition("cell")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    return path


_FILTERED_LANG = "en"


@op(
    "scan_ivf_probe_filtered",
    oracle=_IVF_ASSIGN_CTE_DUCK
    + f"""
    , probes AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn FROM vc
      ) WHERE rn <= 2
    ), cand AS (
      SELECT p.vec_id AS vec_id, a.vec_id AS neighbor_id
      FROM probes p
      JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.vec_id
      JOIN documents d ON d.doc_id = a.vec_id AND d.lang = '{_FILTERED_LANG}'
      WHERE {_IVF_PROBE_SAMPLE_DUCK}
    ), scored AS (
      SELECT c.vec_id, c.neighbor_id,
             list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) / (a.nrm * b.nrm) AS sim
      FROM cand c JOIN vn a ON a.vec_id = c.vec_id JOIN vn b ON b.vec_id = c.neighbor_id
    )
    SELECT vec_id, neighbor_id, round(sim, 4) AS sim FROM (
      SELECT vec_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def scan_ivf_probe_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED ANN serving — attribute-predicated vector search, the
    query every real retrieval stack actually runs ("top-k neighbors
    WHERE lang = 'en'", VERDICT r10 missing #1). Two decisions carry the
    semantics and the scale:

    1. **The predicate is applied BELOW the rescore, on the member scan
       itself.** Post-filtering a top-k under-fills results (a query
       whose unfiltered top-5 contains 3 non-English neighbors returns
       2 rows); here candidates are restricted to lang-matching members
       FIRST and the top-5 is ranked over survivors, so k is maintained
       whenever the probed cells hold >= 5 matching vectors.
    2. **The metadata lives IN the index** (_write_ivf_meta_index joins
       lang/source next to each vector at build time), so the predicate
       reaches the parquet scan as a PushedFilters row-group filter on
       only the probed cells — proved by
       tests/test_plans.py::test_filtered_probe_pushes_lang_to_index_scan.
       The alternative (join members to the documents table at serve
       time) re-shuffles every probed member per query batch.

    Same deterministic md5-nibble query workload, same exact-cosine
    rescore fold, same (sim desc, neighbor_id asc) top-5 as
    scan_ivf_probe — the EXACT oracle states the filter as a join to
    documents, because DuckDB sees the metadata table, not the enriched
    index layout (same rows by construction: the index join is 1:1 on
    vec_id = doc_id)."""
    e = load(spark, sf_dir).embeddings
    cent = label_centroids(e)
    back = spark.read.parquet(_write_ivf_meta_index(spark, sf_dir))
    # The attribute predicate, applied to the index scan itself: lang is a
    # data column of the persisted layout, so this is a parquet pushdown
    # on probed cells — not a post-rescore drop, not a metadata join.
    return _ivf_serve_probe(e, cent, back.where(F.col("lang") == _FILTERED_LANG))


def _ivf_append_parts(spark: SparkSession, sf_dir: str):
    """(index_root, cutoff, cent): build the BASE index (vec_id <= the
    0.8-quantile cutoff — the dedup_incremental split convention) and
    return the pieces the append step needs. The quantizer is trained on
    the base corpus ONLY; that is the invariant that makes the append a
    pure assignment pass."""
    from .scans import _scratch

    e = load(spark, sf_dir).embeddings
    cutoff = e.agg(
        F.floor(F.lit(0.8) * F.max("vec_id")).cast("bigint").alias("c")
    ).collect()[0]["c"]
    base = e.where(F.col("vec_id") <= cutoff)
    cent = label_centroids(base)
    path = _scratch("embeddings_ivf_incr")
    base_idx = base.join(ivf_assign(base, cent), "vec_id").select("vec_id", "embedding", "cell")
    (
        base_idx.repartition("cell")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    return path, cutoff, cent


_IVF_APPEND_ORACLE = """
    WITH e AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
    ), cut AS (
      SELECT CAST(floor(0.8 * max(vec_id)) AS BIGINT) AS c FROM embeddings
    ), cx AS (  -- decimal-exact label centroids, trained on the BASE corpus only
      SELECT label, p.pos,
             CAST(CAST(CAST(sum(CAST(v[p.pos] AS DECIMAL(38,8))) AS DOUBLE) / count(*) AS VARCHAR) AS DOUBLE) AS mean_val
      FROM e CROSS JOIN cut CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) p
      WHERE e.vec_id <= cut.c
      GROUP BY label, p.pos
    ), cent AS (
      SELECT label AS cell, list(mean_val ORDER BY pos) AS c FROM cx GROUP BY label
    ), vn AS (
      SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
    ), cn AS (
      SELECT cell, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS cnrm FROM cent
    ), vc AS (
      SELECT vn.vec_id, cn.cell,
             list_sum(list_transform(list_zip(vn.v, cn.c), p -> p[1] * p[2])) / (vn.nrm * cn.cnrm) AS csim
      FROM vn CROSS JOIN cn
    ), assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn FROM vc
      ) WHERE rn = 1
    )
    SELECT CAST(a.cell AS BIGINT) AS cell,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN a.vec_id <= cut.c THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
           CAST(sum(CASE WHEN a.vec_id > cut.c THEN 1 ELSE 0 END) AS BIGINT) AS n_appended,
           CAST(sum(a.vec_id) AS BIGINT) AS vecid_sum
    FROM assign a CROSS JOIN cut GROUP BY a.cell
    """


@op("sink_ivf_append", oracle=_IVF_APPEND_ORACLE)
def sink_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance — the daily-crawl append
    (VERDICT r10 missing #2), mirroring dedup_incremental's shape on the
    vector side: the newest ~20% of vectors (vec_id above the
    0.8-quantile cutoff) are assigned to the EXISTING cells of the
    base-corpus index and written ``mode("append")`` into the same
    cell-partitioned layout — no retraining, no rewrite of base data.

    Why this is the 100 TB form: a rebuild re-reads and re-writes the
    whole index every day (O(corpus)); the append assigns one day's
    vectors against a broadcast centroid frame and adds files into
    existing cell directories (O(new)). The quantizer is trained on the
    base corpus only — appended vectors land in their nearest EXISTING
    cell, exactly what a serving probe (which reads the persisted
    quantizer) expects; drift between the frozen quantizer and the
    growing corpus is what the periodic-rebuild cadence (sink_ivf_layout)
    plus a rebalance pass absorb. Appends create one file per cell per
    batch — small-file pressure is the sink_compact_small_files cadence.

    The readback rollup proves the merged index lossless per cell and
    separates provenance: n_base (vec_id <= cutoff) + n_appended
    (> cutoff) = n_vecs, with an exact vec_id checksum. The EXACT oracle
    recomputes base-trained centroids and the nearest-cell assignment of
    ALL vectors algebraically. Probe agreement (base-index neighbors
    unchanged by the append; new vectors appear once appended) is pinned
    by tests/test_invariants.py::test_ivf_append_probe_agreement."""
    path, cutoff, cent = _ivf_append_parts(spark, sf_dir)
    e = load(spark, sf_dir).embeddings
    new = e.where(F.col("vec_id") > cutoff)
    new_idx = new.join(ivf_assign(new, cent), "vec_id").select("vec_id", "embedding", "cell")
    (
        new_idx.repartition("cell")
        .sortWithinPartitions("vec_id")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.groupBy(F.col("cell").cast("bigint").alias("cell")).agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.sum(F.when(F.col("vec_id") <= cutoff, 1).otherwise(0)).cast("bigint").alias("n_base"),
        F.sum(F.when(F.col("vec_id") > cutoff, 1).otherwise(0)).cast("bigint").alias("n_appended"),
        F.sum("vec_id").cast("bigint").alias("vecid_sum"),
    )


def _cell_scores(e: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cell, csim, crank): every vector's cosine to every broadcast
    centroid, ranked per vector (csim desc, cell asc) — THE scoring kernel
    of the label-quantizer IVF family. ivf_assign, _ivf_probe_rescore,
    _ivf_serve_probe's query side, and the r11 diagnostics
    (dq_ann_index_health, diag_ann_nprobe_curve) all rank cells through
    this one body (r12 consolidation of the r11 VERDICT queue #2), so
    assign-at-build and score-at-serve are the same expression by
    construction."""
    agg_sum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    vn = _norm_vectors(e)
    vc = vn.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cell",
        (
            agg_sum(F.zip_with(F.col("v"), F.col("c"), lambda x, y: x * y))
            / (F.col("nrm") * F.col("cnrm"))
        ).alias("csim"),
    )
    w_cell = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cell").asc())
    return vc.withColumn("crank", F.row_number().over(w_cell))


@op(
    "diag_ann_nprobe_curve",
    oracle=_IVF_ASSIGN_CTE_DUCK
    + """
    , pr AS (
      SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS crank
      FROM vc
    ), cand AS (
      SELECT p.vec_id AS vec_id, a.vec_id AS neighbor_id, p.crank
      FROM pr p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.vec_id
      WHERE p.crank <= 3
    ), scored AS (
      SELECT c.vec_id, c.neighbor_id, c.crank,
             list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) / (a.nrm * b.nrm) AS sim
      FROM cand c JOIN vn a ON a.vec_id = c.vec_id JOIN vn b ON b.vec_id = c.neighbor_id
    ), ann AS (
      SELECT nprobe, vec_id, neighbor_id FROM (
        SELECT np.nprobe, s.vec_id, s.neighbor_id,
               row_number() OVER (PARTITION BY np.nprobe, s.vec_id ORDER BY s.sim DESC, s.neighbor_id ASC) AS rn
        FROM scored s CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS nprobe) np
        WHERE s.crank <= np.nprobe
      ) WHERE rn <= 5
    ), ex AS (
      SELECT vec_id, neighbor_id FROM (
        SELECT a.vec_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id ORDER BY
                 list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) / (a.nrm * b.nrm) DESC,
                 b.vec_id ASC) AS rn
        FROM vn a JOIN vn b ON a.vec_id <> b.vec_id
      ) WHERE rn <= 5
    ), lev AS (
      SELECT np.nprobe, e2.vec_id, e2.neighbor_id
      FROM ex e2 CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS nprobe) np
    )
    SELECT CAST(l.nprobe AS BIGINT) AS nprobe,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           round(CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS recall
    FROM lev l LEFT JOIN ann a
      ON a.nprobe = l.nprobe AND a.vec_id = l.vec_id AND a.neighbor_id = l.neighbor_id
    GROUP BY l.nprobe
    """,
)
def diag_ann_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN TUNING CURVE: recall@5 of the IVF search at nprobe = 1, 2,
    3 against the exact kNN — the artifact that sets the one knob every
    IVF deployment exposes (more probed cells = more recall = more
    candidate work, linearly). sim_knn_ivf_recall grades the shipped
    nprobe=2 point; this op grades the CURVE, so a capacity review reads
    recall-per-cost off one 3-row frame instead of re-running the
    pipeline per setting.

    One pass computes all three levels: cells are ranked once per query
    (crank), candidates carry the crank of their assigned cell, and level
    nprobe's top-5 ranks candidates with crank <= nprobe — the nesting
    (level n's candidate set contains level n-1's) means no per-level
    re-scan. Exact side reuses the blocked sim_cosine_knn kernel.

    Scale: candidate work is the sim_knn_ivf plan at nprobe=3; the exact
    side is O(n²) by definition — at 100 TB this diagnostic runs on a
    deterministic hash-sample of queries (the sim_knn_recall convention),
    which estimates the curve, not the index. Columns: nprobe, n_exact
    (5 × queries), n_hits, recall."""
    e = load(spark, sf_dir).embeddings.repartition(embed_partitions(spark), "vec_id")
    cent = label_centroids(e)
    agg_sum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vn = e.select("vec_id", v.alias("v")).withColumn(
        "nrm", F.sqrt(agg_sum(F.transform(F.col("v"), lambda x: x * x)))
    )
    ranked = _cell_scores(e, cent)
    assign = ranked.where(F.col("crank") == 1).select("vec_id", "cell")
    probes = ranked.where(F.col("crank") <= 3).select("vec_id", "cell", "crank")

    p, a = probes.alias("p"), assign.alias("a")
    cand = p.join(
        a, (F.col("a.cell") == F.col("p.cell")) & (F.col("a.vec_id") != F.col("p.vec_id"))
    ).select(
        F.col("p.vec_id").alias("vec_id"),
        F.col("a.vec_id").alias("neighbor_id"),
        F.col("p.crank").alias("crank"),
    )
    na, nb, c = vn.alias("na"), vn.alias("nb"), cand.alias("c")
    scored = (
        c.join(na, F.col("na.vec_id") == F.col("c.vec_id"))
        .join(nb, F.col("nb.vec_id") == F.col("c.neighbor_id"))
        .select(
            F.col("c.vec_id").alias("vec_id"),
            F.col("c.neighbor_id").alias("neighbor_id"),
            F.col("c.crank").alias("crank"),
            (
                agg_sum(F.zip_with(F.col("na.v"), F.col("nb.v"), lambda x, y: x * y))
                / (F.col("na.nrm") * F.col("nb.nrm"))
            ).alias("sim"),
        )
    )
    levels = F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("nprobe")
    lev = scored.select("vec_id", "neighbor_id", "crank", "sim", levels).where(
        F.col("crank") <= F.col("nprobe")
    )
    w_rank = Window.partitionBy("nprobe", "vec_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    ann = (
        lev.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= 5)
        .select("nprobe", "vec_id", "neighbor_id")
        .alias("ann")
    )
    ex = (
        sim_cosine_knn(spark, sf_dir)
        .select("vec_id", "neighbor_id", levels)
        .alias("ex")
    )
    joined = ex.join(
        ann,
        (F.col("ann.nprobe") == F.col("ex.nprobe"))
        & (F.col("ann.vec_id") == F.col("ex.vec_id"))
        & (F.col("ann.neighbor_id") == F.col("ex.neighbor_id")),
        "left",
    )
    hit = F.sum(F.when(F.col("ann.neighbor_id").isNotNull(), 1).otherwise(0))
    return joined.groupBy(F.col("ex.nprobe").cast("bigint").alias("nprobe")).agg(
        F.count("*").cast("bigint").alias("n_exact"),
        hit.cast("bigint").alias("n_hits"),
        F.round(hit.cast("double") / F.count("*"), 4).alias("recall"),
    )


@op(
    "dq_ann_index_health",
    oracle=_IVF_ASSIGN_CTE_DUCK
    + """
    , m AS (
      SELECT a.cell, a.vec_id, vc.csim
      FROM assign a JOIN vc ON vc.vec_id = a.vec_id AND vc.cell = a.cell
    ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e)
    SELECT CAST(m.cell AS BIGINT) AS cell,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(CAST(count(*) AS DOUBLE) / any_value(tot.n), 4) AS share,
           round(CAST(sum(CAST(m.csim AS DECIMAL(38,8))) AS DOUBLE) / count(*), 6) AS mean_csim,
           round(CAST(min(m.csim) AS DOUBLE), 6) AS min_csim
    FROM m CROSS JOIN tot GROUP BY m.cell
    """,
)
def dq_ann_index_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index health profile — the monitoring row a vector-serving
    deployment alarms on, per cell: member count, corpus share (hot-cell
    skew — the quantity that decides when sink_ivf_rebalance must run),
    mean member→centroid cosine (quantizer fit: drifts DOWN as appends
    accumulate on a frozen quantizer — the rebuild trigger), and the
    worst member's cosine (outliers that will rescore badly wherever
    they land).

    Plan: the assignment scoring reused from the IVF family (broadcast
    centroids, one shuffle on cell), mean via the decimal-cast sum so the
    float fold is order-independent (registry rule 1), corpus total a
    1-row broadcast scalar. Output is #cells rows — dashboard-sized at
    any corpus scale."""
    e = load(spark, sf_dir).embeddings
    cent = label_centroids(e)
    m = _cell_scores(e, cent).where(F.col("crank") == 1)
    tot = e.agg(F.count("*").cast("bigint").alias("n"))
    return (
        m.crossJoin(F.broadcast(tot))
        .groupBy(F.col("cell").cast("bigint").alias("cell"))
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.round(F.count("*").cast("double") / F.any_value("n"), 4).alias("share"),
            F.round(
                F.sum(F.col("csim").cast("decimal(38,8)")).cast("double") / F.count("*"), 6
            ).alias("mean_csim"),
            F.round(F.min("csim").cast("double"), 6).alias("min_csim"),
        )
    )


@op(
    "sink_ivf_rebalance",
    oracle=_IVF_ASSIGN_CTE_DUCK
    + """
    , sizes AS (SELECT cell, count(*) AS nv FROM assign GROUP BY cell
    ), tots AS (
      SELECT CAST(count(*) AS BIGINT) AS total, CAST(count(DISTINCT cell) AS BIGINT) AS ncells
      FROM assign
    ), hot AS (
      SELECT s.cell FROM sizes s CROSS JOIN tots t WHERE s.nv * t.ncells > t.total
    ), seeda AS (
      SELECT a.cell, min(a.vec_id) AS a_id
      FROM assign a JOIN hot h ON h.cell = a.cell GROUP BY a.cell
    ), acos AS (
      SELECT a.cell, a.vec_id,
             list_sum(list_transform(list_zip(m.v, s.v), p -> p[1] * p[2])) / (m.nrm * s.nrm) AS cos_a
      FROM assign a
      JOIN seeda sa ON sa.cell = a.cell
      JOIN vn m ON m.vec_id = a.vec_id
      JOIN vn s ON s.vec_id = sa.a_id
    ), seedb AS (
      SELECT cell, vec_id AS b_id FROM (
        SELECT cell, vec_id, row_number() OVER (PARTITION BY cell ORDER BY cos_a ASC, vec_id ASC) AS rn
        FROM acos
      ) WHERE rn = 1
    ), bcos AS (
      SELECT a.cell, a.vec_id,
             list_sum(list_transform(list_zip(m.v, b.v), p -> p[1] * p[2])) / (m.nrm * b.nrm) AS cos_b
      FROM assign a
      JOIN seedb sb ON sb.cell = a.cell
      JOIN vn m ON m.vec_id = a.vec_id
      JOIN vn b ON b.vec_id = sb.b_id
    ), final AS (
      SELECT ac.cell, ac.vec_id, CASE WHEN ac.cos_a >= bc.cos_b THEN 0 ELSE 1 END AS sub
      FROM acos ac JOIN bcos bc ON bc.cell = ac.cell AND bc.vec_id = ac.vec_id
      UNION ALL
      SELECT a.cell, a.vec_id, 0 AS sub
      FROM assign a WHERE a.cell NOT IN (SELECT cell FROM hot)
    )
    SELECT CAST(cell AS BIGINT) AS cell, CAST(sub AS BIGINT) AS sub,
           CAST(count(*) AS BIGINT) AS n_vecs, CAST(sum(vec_id) AS BIGINT) AS vecid_sum,
           CAST(min(vec_id) AS BIGINT) AS vec_min, CAST(max(vec_id) AS BIGINT) AS vec_max
    FROM final GROUP BY cell, sub
    """,
)
def sink_ivf_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell REBALANCE — the third maintenance verb of the index
    lifecycle (build: sink_ivf_layout; append: sink_ivf_append; split hot
    cells: this). Appends onto a frozen quantizer concentrate mass in a
    few cells; a hot cell makes every probe that touches it pay its full
    width. The rebalance splits each cell wider than the mean
    (nv × ncells > total — integer cross-multiply, no float threshold)
    into two sub-cells and rewrites ONLY those partitions via dynamic
    partition overwrite — cold cells' files are untouched, so the pass
    costs O(hot mass), not O(corpus).

    The splitter is a deterministic one-pass bisection (EXACT by
    construction, unlike seeded-kmeans): seed A = the cell's min-vec_id
    member, seed B = the member least similar to A (cosine asc, vec_id
    tie-break), every member joins the nearer seed (tie → A). A
    production pass would iterate Lloyd steps from these seeds (the
    _kmeans_cells machinery); the one-step form pins the maintenance
    TOPOLOGY — sub-cell layout, partial rewrite, readback proof — in the
    hash-graded contract, and the invariant test pins the balance
    property (every split strictly shrinks its parent; sub-cell layout
    lossless).

    Readback rollup: (cell, sub) × count + exact vec_id checksum + id
    range. Serving reads the (cell, sub) directories exactly as before
    via partition pruning — a probe targets the sub-cells whose seed the
    query is nearest, or both while the serving tier has not refreshed
    its centroid view."""
    from .scans import _scratch

    e = load(spark, sf_dir).embeddings
    cent = label_centroids(e)
    # Both frames feed several actions/subtrees below (base write, sizes,
    # tots, the two seed-cosine joins): pin them so the quantizer scoring
    # and the norm fold run once, not once per consumer (the
    # graph_jaccard_link_prediction pin(pairs) convention).
    assign = pin(ivf_assign(e, cent))

    agg_sum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vn = pin(
        e.select("vec_id", v.alias("v")).withColumn(
            "nrm", F.sqrt(agg_sum(F.transform(F.col("v"), lambda x: x * x)))
        )
    )

    path = _scratch("embeddings_ivf_rebal")
    base = e.join(assign, "vec_id").select("vec_id", "embedding", "cell").withColumn(
        "sub", F.lit(0)
    )
    (
        base.repartition("cell")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("cell", "sub")
        .parquet(path)
    )

    sizes = assign.groupBy("cell").agg(F.count("*").alias("nv"))
    tots = assign.agg(
        F.count("*").cast("bigint").alias("total"),
        F.countDistinct("cell").cast("bigint").alias("ncells"),
    )
    hot = (
        sizes.crossJoin(F.broadcast(tots))
        .where(F.col("nv") * F.col("ncells") > F.col("total"))
        .select("cell")
    )
    hm = assign.join(hot, "cell").alias("hm")
    seeda = hm.groupBy("cell").agg(F.min("vec_id").alias("a_id"))

    m, sa = vn.alias("m"), vn.alias("sa")
    acos = (
        hm.join(seeda, "cell")
        .join(m, F.col("m.vec_id") == F.col("hm.vec_id"))
        .join(sa, F.col("sa.vec_id") == F.col("a_id"))
        .select(
            "cell",
            F.col("m.vec_id").alias("vec_id"),
            (
                agg_sum(F.zip_with(F.col("m.v"), F.col("sa.v"), lambda x, y: x * y))
                / (F.col("m.nrm") * F.col("sa.nrm"))
            ).alias("cos_a"),
        )
    )
    w_b = Window.partitionBy("cell").orderBy(F.col("cos_a").asc(), F.col("vec_id").asc())
    seedb = (
        acos.withColumn("rn", F.row_number().over(w_b))
        .where(F.col("rn") == 1)
        .select("cell", F.col("vec_id").alias("b_id"))
    )
    sb = vn.alias("sb")
    bcos = (
        hm.join(seedb, "cell")
        .join(m, F.col("m.vec_id") == F.col("hm.vec_id"))
        .join(sb, F.col("sb.vec_id") == F.col("b_id"))
        .select(
            "cell",
            F.col("m.vec_id").alias("vec_id"),
            (
                agg_sum(F.zip_with(F.col("m.v"), F.col("sb.v"), lambda x, y: x * y))
                / (F.col("m.nrm") * F.col("sb.nrm"))
            ).alias("cos_b"),
        )
    )
    split = (
        acos.join(bcos, ["cell", "vec_id"])
        .withColumn("sub", F.when(F.col("cos_a") >= F.col("cos_b"), 0).otherwise(1))
        .select("cell", "vec_id", "sub")
    )
    split_idx = (
        e.join(split, "vec_id").select("vec_id", "embedding", "cell", "sub")
    )
    # Rewrite ONLY the hot cells' partitions: dynamic overwrite replaces
    # exactly the (cell, sub) directories present in this frame.
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        (
            split_idx.repartition("cell", "sub")
            .sortWithinPartitions("vec_id")
            .write.mode("overwrite")
            .partitionBy("cell", "sub")
            .parquet(path)
        )
    finally:
        spark.conf.set(key, prev) if prev is not None else spark.conf.unset(key)

    back = spark.read.parquet(path)
    return back.groupBy(
        F.col("cell").cast("bigint").alias("cell"), F.col("sub").cast("bigint").alias("sub")
    ).agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.sum("vec_id").cast("bigint").alias("vecid_sum"),
        F.min("vec_id").cast("bigint").alias("vec_min"),
        F.max("vec_id").cast("bigint").alias("vec_max"),
    )


@op(
    "sink_ivf_delete",
    oracle=_IVF_ASSIGN_CTE_DUCK
    + """
    SELECT CAST(a.cell AS BIGINT) AS cell,
           CAST(sum(CASE WHEN NOT a.del THEN 1 ELSE 0 END) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN NOT a.del THEN a.vec_id ELSE 0 END) AS BIGINT) AS vecid_sum,
           CAST(sum(CASE WHEN a.del THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted
    FROM (
      SELECT vec_id, cell,
             instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1 = 15 AS del
      FROM assign
    ) a
    GROUP BY a.cell
    """,
)
def sink_ivf_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index DELETION — the right-to-be-forgotten verb that completes
    the lifecycle (build / append / compact / rebalance / DELETE): a
    deterministic deletion set (first md5 nibble of vec_id = 15, ~1/16 of
    members — standing in for the erasure-request id list a GDPR pipeline
    receives) is removed from the persisted cell-partitioned index in the
    two phases a real deployment runs:

    1. TOMBSTONE (logical, instant): the deletion manifest is written
       next to the index; serving anti-joins it, so erased vectors stop
       appearing the moment the manifest lands — no data rewritten.
    2. PURGE (physical, amortized): only the cells that hold tombstoned
       members are rewritten survivor-only via dynamic partition
       overwrite (the sink_ivf_compact fold discipline — pinned merge
       frame, O(touched mass) not O(corpus)); a cell whose members were
       ALL deleted is not in the survivor frame, so dynamic overwrite
       cannot clear it — those directories are removed explicitly (the
       bounded ≤cell-count collect below). The manifest is then retired
       to an _applied audit trail, which the rollup also reads back —
       erasure compliance wants proof of WHAT was purged, not just its
       absence.

    Crash-recovery contract (the purge is a multi-step sequence; the
    MANIFEST RENAME at the end is the commit point): serving always
    anti-joins the live tombstone manifest, so every intermediate state —
    crash after the dynamic overwrite, crash between the overwrite and
    the fully-deleted-cell rmtree — still serves correctly (erased ids
    stay masked by phase 1). Re-running the purge from any such state is
    safe and convergent: touched cells come from the manifest, survivors
    are recomputed from the CURRENT on-disk index (anti-join is
    idempotent — already-purged cells rewrite to themselves), and a
    fully-deleted cell whose directory survived a crash re-enters the
    ``fully`` list and is removed (rmtree ignore_errors makes the removal
    itself re-runnable). Only after all physical work does the manifest
    rename to ``_applied`` retire the tombstones; until that rename the
    purge is considered not-run and must be re-driven from the manifest.

    Readback rollup (EXACT): per cell, surviving count + exact vec_id
    checksum + the applied-deletion count — the oracle recomputes the
    full-corpus assignment algebraically and splits it on the same md5
    predicate. Probe agreement between the tombstone view and the purged
    index, and the absence of every erased id from serving answers, are
    pinned by tests/test_invariants.py::test_ivf_delete_tombstone_purge_agree."""
    import shutil as _sh

    from .curation import HEX
    from .scans import _scratch

    e = load(spark, sf_dir).embeddings
    cent = label_centroids(e)
    idx = e.join(ivf_assign(e, cent), "vec_id").select("vec_id", "embedding", "cell")
    path = _scratch("embeddings_ivf_del")
    (
        idx.repartition("cell")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )

    # Phase 1: tombstone manifest (vec_id, cell) — cell rides along so the
    # purge prunes to touched partitions without re-deriving assignments.
    del_pred = (
        F.instr(F.lit(HEX), F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1)) - 1 == 15
    )
    back = spark.read.parquet(path)
    ts_path = path + "_tombstones"
    back.where(del_pred).select("vec_id", "cell").write.mode("overwrite").parquet(ts_path)

    # Phase 2: purge — survivor-only rewrite of ONLY the touched cells.
    tsr = spark.read.parquet(ts_path)
    touched = tsr.select("cell").distinct()
    survivors = pin(
        back.join(F.broadcast(touched), "cell")
        .join(tsr.select("vec_id"), "vec_id", "left_anti")
        .select("vec_id", "embedding", "cell")
    )
    fully = [r.cell for r in touched.join(survivors.select("cell").distinct(), "cell", "left_anti").collect()]  # <= cell-count rows (quantizer metadata)
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        (
            survivors.repartition("cell")
            .sortWithinPartitions("vec_id")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(path)
        )
    finally:
        spark.conf.set(key, prev) if prev is not None else spark.conf.unset(key)
    for c in fully:
        _sh.rmtree(os.path.join(path, f"cell={c}"), ignore_errors=True)

    applied = path + "_applied"
    _sh.rmtree(applied, ignore_errors=True)
    os.rename(ts_path, applied)

    sur = spark.read.parquet(path).groupBy(F.col("cell").cast("bigint").alias("cell")).agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.sum("vec_id").cast("bigint").alias("vecid_sum"),
    )
    dels = spark.read.parquet(applied).groupBy(
        F.col("cell").cast("bigint").alias("cell")
    ).agg(F.count("*").cast("bigint").alias("n_deleted"))
    return sur.join(dels, "cell", "full").select(
        "cell",
        F.coalesce("n_vecs", F.lit(0)).cast("bigint").alias("n_vecs"),
        F.coalesce("vecid_sum", F.lit(0)).cast("bigint").alias("vecid_sum"),
        F.coalesce("n_deleted", F.lit(0)).cast("bigint").alias("n_deleted"),
    )


IVF_ERASE_N = 8  # pinned by the sink_ivf_delete_kmeans / sink_pq_delete oracles (LIMIT 8) — not an env knob; ladder runs pass their own list


def _ivf_kmeans_erasure(members: DataFrame, n: int = IVF_ERASE_N) -> DataFrame:
    """The deterministic stand-in for a GDPR erasure-request list: the
    ``n`` vec_ids with the lexicographically smallest md5 digests — a
    fixed-SIZE, pseudo-randomly spread id set. Fixed size is the point:
    a real erasure request does not grow with the corpus, so the purge's
    touched-cell count is bounded by the request size however large the
    index gets (the property the delete ladder measures; contrast the
    1/16-of-corpus predicate sink_ivf_delete grades, which by design
    touches every cell). NOTE this rank-based selection is NOT stable
    under deletion (erasing the 8 smallest digests promotes the next 8),
    which is exactly why the delete helpers treat the erasure list as an
    INPUT and recover in-flight requests from the persisted manifest —
    regenerating the list mid-request would erase ids nobody asked for."""
    return (
        members.select("vec_id")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(n)
    )


def _ivf_kmeans_delete(
    spark: SparkSession, root: str, erase_ids: list[int] | None = None
) -> None:
    """Tombstone-then-purge an erasure list from the kmeans-quantized
    serving index at ``root`` (the _write_ivf_kmeans_index layout) — the
    DEPLOYMENT delete, where O(touched cells) actually binds (the r12
    delete ladder showed the ~10-cell label quantizer degenerates to a
    full rewrite; with √n trained cells a bounded erasure list touches a
    bounded cell subset and everything else is never read or written).

    ``erase_ids`` is the request — in deployment it arrives externally
    (an erasure ticket), so it is an input, not something this helper
    computes; None derives the fixture list (_ivf_kmeans_erasure) for the
    graded op.

    1. LOCATE + TOMBSTONE: the erasure ids become an IN-list predicate on
       the member scan — members are vec_id-sorted within each cell file,
       so parquet row-group/page stats skip almost everything and finding
       the erased members costs near-metadata, not a corpus scan. The
       (vec_id, cell) manifest lands next to the index; serving anti-joins
       it, so erased vectors stop appearing before any rewrite.
    2. PURGE: the touched-cell set (≤ erasure-list size, collected as
       metadata) becomes a static partition filter — ONLY touched cell
       directories are read, survivor-filtered map-side (NOT IN — no
       shuffle), and rewritten via dynamic partition overwrite; a touched
       cell with no survivors is removed outright. Untouched cells are
       byte-identical after the purge (invariant-tested).

    Crash-recovery contract: the manifest rename to ``tombstones_applied``
    is the commit point; serving stays correct in every intermediate state
    because the live manifest keeps masking erased ids. A re-run that
    finds a COMPLETE un-retired manifest (parquet _SUCCESS present)
    resumes THAT request — the erasure ids are re-read from the manifest,
    never regenerated, because a rank-based fixture list recomputed over a
    half-purged index would name different ids (see _ivf_kmeans_erasure) —
    and the purge is idempotent from there: survivors are recomputed from
    the current on-disk index and already-purged cells rewrite to
    themselves. An absent or incomplete manifest means no request is in
    flight and the tombstone phase starts (or restarts) from the input.
    Pinned by tests/test_invariants.py::test_ivf_kmeans_delete_rerun_resumes_manifest."""
    import shutil as _sh

    cells_path = os.path.join(root, "cells")
    ts_path = os.path.join(root, "tombstones")
    back = spark.read.parquet(cells_path)
    if os.path.exists(os.path.join(ts_path, "_SUCCESS")):
        # in-flight request: resume from the committed manifest
        erase_ids = [r.vec_id for r in spark.read.parquet(ts_path).select("vec_id").collect()]  # bounded: the in-flight erasure request
    else:
        if erase_ids is None:
            erase_ids = [r.vec_id for r in _ivf_kmeans_erasure(back).collect()]  # bounded: <= IVF_ERASE_N erasure-request ids
        ts = back.where(F.col("vec_id").isin(erase_ids)).select("vec_id", "cell")
        ts.write.mode("overwrite").parquet(ts_path)

    tsr = spark.read.parquet(ts_path)
    touched = [r.cell for r in tsr.select("cell").distinct().collect()]  # bounded: <= IVF_ERASE_N touched-cell ids (quantizer metadata)
    bound = spark.read.parquet(cells_path).where(F.col("cell").isin(touched))
    survivors = pin(bound.where(~F.col("vec_id").isin(erase_ids)))  # breaks lineage from cells_path so the overwrite below is legal
    alive = [r.cell for r in survivors.select("cell").distinct().collect()]  # bounded: <= touched-cell count
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        (
            survivors.repartition("cell")
            .sortWithinPartitions("vec_id")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(cells_path)
        )
    finally:
        spark.conf.set(key, prev) if prev is not None else spark.conf.unset(key)
    for c in set(touched) - set(alive):
        _sh.rmtree(os.path.join(cells_path, f"cell={c}"), ignore_errors=True)

    applied = os.path.join(root, "tombstones_applied")
    _sh.rmtree(applied, ignore_errors=True)
    os.rename(ts_path, applied)


@op(
    "sink_ivf_delete_kmeans",
    oracle="""
    WITH del AS (
      SELECT vec_id FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(e.vec_id) AS BIGINT) AS vecid_sum,
           CAST((SELECT count(*) FROM del) AS BIGINT) AS n_deleted,
           CAST((SELECT sum(vec_id) FROM del) AS BIGINT) AS deleted_vecid_sum
    FROM embeddings e WHERE e.vec_id NOT IN (SELECT vec_id FROM del)
    """,
)
def sink_ivf_delete_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index deletion on the DEPLOYMENT (√n trained kmeans) quantizer
    — the form where sink_ivf_delete's O(touched-cell mass) headline
    actually binds (VERDICT r12 missing item 2): a fixed-size erasure
    list against k cells touches ≤ |list| of them, so purge cost tracks
    the request, not the corpus. Build the persisted kmeans index (the
    scan_ivf_probe_kmeans layout — quantizer shipped next to the
    cell-partitioned members), tombstone-then-purge the erasure list via
    _ivf_kmeans_delete, and return the quantizer-INDEPENDENT provenance
    rollup: surviving count + exact vec_id checksum from the purged
    index, applied-deletion count + checksum from the retired manifest.
    Cell-level assignments depend on the trained quantizer (ROWS-only by
    construction everywhere else in this family), but these global
    aggregates do not — the guarded 1:1 build contract means the index
    holds exactly the embeddings table, so the oracle recomputes the same
    erasure split relationally and the op grades EXACT.

    Untouched-cell byte-identity, erased-id absence from serving, and
    tombstone-view/purged-index agreement are pinned by
    tests/test_invariants.py::test_ivf_kmeans_delete_touches_only_erased_cells;
    the purge-wall ∝ touched-mass ladder rung is in PLANS.md (r13)."""
    root = _write_ivf_kmeans_index(spark, sf_dir)
    _ivf_kmeans_delete(spark, root)
    sur = spark.read.parquet(os.path.join(root, "cells")).agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.sum("vec_id").cast("bigint").alias("vecid_sum"),
    )
    dl = spark.read.parquet(os.path.join(root, "tombstones_applied")).agg(
        F.count("*").cast("bigint").alias("n_deleted"),
        F.sum("vec_id").cast("bigint").alias("deleted_vecid_sum"),
    )
    return sur.crossJoin(dl)


def _write_pq_meta_index(spark: SparkSession, sf_dir: str) -> str:
    """Write the PQ index with FILTERABLE metadata riding next to each
    code row (vec_id, code, lang — the _write_ivf_meta_index convention
    carried to the compressed layout): an attribute predicate prunes the
    CODE TABLE at the parquet scan, so a filtered ADC pass broadcasts
    only surviving codes. Shared by scan_pq_probe_filtered."""
    from .scans import _scratch

    t = load(spark, sf_dir)
    e = t.embeddings
    unit = _unit_embeddings(e)
    books = _pq_codebooks(unit, raw=e)
    root = _scratch("embeddings_pq_meta")
    _write_books_frame(spark, books, os.path.join(root, "codebooks"))
    codes = unit.mapInPandas(_pq_encode(books), "vec_id long, code long")
    (
        _join_doc_meta_1to1(codes, t.documents, ["lang"])
        .repartitionByRange(8, "vec_id")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .parquet(os.path.join(root, "codes"))
    )
    return root


@op("scan_pq_probe_filtered", oracle=None)
def scan_pq_probe_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute-FILTERED serving from the persisted PQ index — the
    compressed-layout sibling of scan_ivf_probe_filtered: the lang
    predicate lands on the CODE TABLE scan (lang rides next to each code
    row at build, so the filter is a parquet PushedFilters prune
    composing with the ADC pass's vec_id-range chunk pushdown — no
    serve-time metadata join), the ADC scan then broadcasts only
    surviving codes, and the exact rescore ranks top-5 per query over
    survivors — k is MAINTAINED over the filtered candidate set, not
    post-filtered from an unfiltered top-5.

    At 100 TB the economics mirror the IVF finding (r11 ladder: filtering
    in the scan is a cost REDUCTION): a lang that keeps 40% of the corpus
    shrinks every broadcast chunk and every ADC lookup table by the same
    fraction. Oracle = ROWS (trained codebooks); gated by
    tests/test_invariants.py::test_pq_probe_filtered_lang_and_recall —
    lang purity of every answer, run-stability, k-maintenance, and
    recall@5 against the exact FILTERED kNN on the same sample."""
    root = _write_pq_meta_index(spark, sf_dir)
    return _pq_probe_from_root(
        spark, sf_dir, root, member_pred=F.col("lang") == _FILTERED_LANG
    )


@op(
    "sink_pq_compact",
    oracle="""
    WITH cut AS (SELECT CAST(floor(0.8 * max(vec_id)) AS BIGINT) AS c FROM embeddings)
    SELECT CASE WHEN e.vec_id <= cut.c THEN 'base' ELSE 'appended' END AS part,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(e.vec_id) AS BIGINT) AS vecid_sum,
           CAST(min(e.vec_id) AS BIGINT) AS vec_min,
           CAST(max(e.vec_id) AS BIGINT) AS vec_max
    FROM embeddings e CROSS JOIN cut GROUP BY 1
    """,
)
def sink_pq_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ code-table COMPACTION — closes the PQ maintenance loop the same
    way sink_ivf_compact closes the IVF one: every sink_pq_append lands
    new files whose vec_id ranges sit NEXT TO the base range files, so
    weeks of appends fragment the code table — and the ADC serving scan
    (_pq_adc_search) fetches candidates by vec_id-RANGE pushdown, so
    fragmentation turns each range fetch into many small file reads with
    interleaved row-group stats. The compaction rewrites the full code
    table into clean disjoint range partitions (repartitionByRange +
    sortWithinPartitions, the build layout) via a staging dir + rename
    swap (the SCD2 two-step discipline: a complete consistent table
    exists on disk through every crash window).

    Cost honesty: unlike the IVF fold (O(touched cells)), this pass is
    O(all codes) — but codes are the 8 B/vector COMPRESSED form, so a
    1e9-vector corpus rewrites ~8 GB, the cheapest full pass in the whole
    index family; a deployment runs it on the append cadence. Rollup =
    the append provenance oracle (the rewrite is lossless); bit-identical
    code rows, the 8-file layout, and DISJOINT per-file vec_id ranges are
    pinned by tests/test_invariants.py::test_pq_compact_restores_range_layout."""
    import shutil as _sh

    root, cutoff = _pq_append_parts(spark, sf_dir)
    books = _read_codebooks(spark, root)
    e = load(spark, sf_dir).embeddings
    new = e.where(F.col("vec_id") > cutoff)
    codes_dir = os.path.join(root, "codes")
    (
        _unit_embeddings(new)
        .mapInPandas(_pq_encode(books), "vec_id long, code long")
        .repartitionByRange(2, "vec_id")
        .sortWithinPartitions("vec_id")
        .write.mode("append")
        .parquet(codes_dir)
    )

    tmp = codes_dir + "_next"
    (
        spark.read.parquet(codes_dir)
        .repartitionByRange(8, "vec_id")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    prev = codes_dir + "_prev"
    _sh.rmtree(prev, ignore_errors=True)
    os.rename(codes_dir, prev)
    os.rename(tmp, codes_dir)
    _sh.rmtree(prev)

    codes = spark.read.parquet(codes_dir)
    return codes.groupBy(
        F.when(F.col("vec_id") <= cutoff, "base").otherwise("appended").alias("part")
    ).agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.sum("vec_id").cast("bigint").alias("vecid_sum"),
        F.min("vec_id").cast("bigint").alias("vec_min"),
        F.max("vec_id").cast("bigint").alias("vec_max"),
    )


def _pq_swap_recover(codes_dir: str) -> None:
    """Re-run preamble for the staging + rename-swap discipline: if a
    crash hit between the two renames, the serving path is empty but a
    complete consistent table exists next to it — ROLL FORWARD when the
    staged rewrite finished (``_next`` carries parquet _SUCCESS), ROLL
    BACK to the pre-swap table otherwise. A no-op when the serving path
    is present. Raises when neither state exists — that is data loss from
    outside this discipline, not a crash window it owns.

    Roll-forward REMOVES the stale ``_prev`` immediately (ADVICE r13 #2):
    ``_prev`` is the pre-purge table — leaving it recoverable would let a
    LATER loss of the serving dir silently roll back to rows a committed
    purge already erased (resurrecting personal data after the manifest
    retired). After the rmtree the only recoverable states are ones
    consistent with the purge; an outside-the-discipline loss raises."""
    import shutil as _sh

    tmp = codes_dir + "_next"
    prev = codes_dir + "_prev"
    if os.path.exists(codes_dir):
        return
    if os.path.exists(os.path.join(tmp, "_SUCCESS")):
        os.rename(tmp, codes_dir)
        _sh.rmtree(prev, ignore_errors=True)
    elif os.path.exists(prev):
        os.rename(prev, codes_dir)
    else:
        raise FileNotFoundError(
            f"no code table at {codes_dir} and no swap state (_next/_prev) to recover from"
        )


@op(
    "sink_pq_delete",
    oracle="""
    WITH del AS (
      SELECT vec_id FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
    )
    SELECT CAST(count(*) AS BIGINT) AS n_codes,
           CAST(sum(e.vec_id) AS BIGINT) AS vecid_sum,
           CAST((SELECT count(*) FROM del) AS BIGINT) AS n_deleted,
           CAST((SELECT sum(vec_id) FROM del) AS BIGINT) AS deleted_vecid_sum
    FROM embeddings e WHERE e.vec_id NOT IN (SELECT vec_id FROM del)
    """,
)
def sink_pq_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erasure against the COMPRESSED serving layout — the delete verb
    that completes the PQ lifecycle (encode / append / compact / serve /
    DELETE), because a right-to-be-forgotten request must purge the code
    table too, not just the full-precision index: a PQ code is derived
    personal data. Same fixed-size erasure list as sink_ivf_delete_kmeans
    (the 8 smallest-md5 vec_ids — one GDPR request, every index it
    touches), two phases:

    1. TOMBSTONE (instant): the erased (vec_id, code) rows — located by
       IN-list pushdown over the vec_id-range-sorted code files, near-
       metadata cost — land in a manifest next to the index; ADC serving
       anti-joins it, so erased vectors stop scoring immediately.
    2. PURGE folded into the COMPACTION pass: an id-RANGE layout spreads
       any erasure list uniformly across the range partitions, so unlike
       the cell-partitioned IVF there is no touched-subset to exploit —
       the honest amortization is purge-at-compaction: the survivor-only
       rewrite (``NOT IN``, map-side) rides the same full-table
       repartitionByRange + staging + rename-swap pass the table needs on
       the append cadence anyway, at zero marginal cost. O(all codes),
       but codes are the 8 B/vector compressed form — the cheapest full
       pass in the index family (sink_pq_compact's cost note).

    Crash-recovery contract, stated precisely: the manifest retires to
    ``tombstones_applied`` AFTER the swap — the commit point. A complete
    consistent code table exists ON DISK through every crash window, but
    between the two renames it lives at ``codes_prev``/``codes_next``,
    not at the serving path — so the re-run preamble ROLLS the swap
    FORWARD (``codes_next`` complete → rename it in) or BACK
    (``codes_prev`` present → restore it) before doing anything else. The
    in-flight erasure ids are then re-read from the committed manifest,
    never regenerated (a rank-based fixture list recomputed over a
    half-purged table would name different ids — _ivf_kmeans_erasure's
    caveat), and the survivor rewrite is idempotent from there. Serving
    correctness never depends on the purge: the live manifest masks
    erased ids in every intermediate state.

    Rollup (EXACT, quantizer-independent): every vector yields exactly
    one code row (the append-oracle invariant), so surviving-code count +
    exact vec_id checksum and the applied count + checksum equal the same
    split computed relationally over the embeddings table — no trained
    value is graded. Survivor code BIT-identity, erased-id absence, and
    the preserved range layout are pinned by
    tests/test_invariants.py::test_pq_delete_survivors_bit_identical."""
    import shutil as _sh

    root = _write_pq_meta_index(spark, sf_dir)
    codes_dir = os.path.join(root, "codes")
    tmp = codes_dir + "_next"
    prev = codes_dir + "_prev"
    ts_path = os.path.join(root, "tombstones")
    _pq_swap_recover(codes_dir)
    back = spark.read.parquet(codes_dir)
    if os.path.exists(os.path.join(ts_path, "_SUCCESS")):
        # in-flight request: resume from the committed manifest
        erase_ids = [r.vec_id for r in spark.read.parquet(ts_path).select("vec_id").collect()]  # bounded: the in-flight erasure request
    else:
        erase_ids = [r.vec_id for r in _ivf_kmeans_erasure(back).collect()]  # bounded: <= IVF_ERASE_N erasure-request ids (one request, every index)
        back.where(F.col("vec_id").isin(erase_ids)).select("vec_id", "code").write.mode(
            "overwrite"
        ).parquet(ts_path)

    (
        spark.read.parquet(codes_dir)
        .where(~F.col("vec_id").isin(erase_ids))
        .repartitionByRange(8, "vec_id")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    _sh.rmtree(prev, ignore_errors=True)
    os.rename(codes_dir, prev)
    os.rename(tmp, codes_dir)
    _sh.rmtree(prev)
    applied = os.path.join(root, "tombstones_applied")
    _sh.rmtree(applied, ignore_errors=True)
    os.rename(ts_path, applied)

    sur = spark.read.parquet(codes_dir).agg(
        F.count("*").cast("bigint").alias("n_codes"),
        F.sum("vec_id").cast("bigint").alias("vecid_sum"),
    )
    dl = spark.read.parquet(applied).agg(
        F.count("*").cast("bigint").alias("n_deleted"),
        F.sum("vec_id").cast("bigint").alias("deleted_vecid_sum"),
    )
    return sur.crossJoin(dl)


def _ivf_kmeans_append(spark: SparkSession, sf_dir: str, root: str, cutoff: int) -> None:
    """Append the post-cutoff vectors to the kmeans index at ``root``:
    centroids are read BACK FROM THE INDEX (frozen — the shipped
    quantizer, never retrained) and assignment routes through the same
    _kmeans_assign body the build uses; new members land mode("append")
    in existing cell directories, base files never rewritten. Factored
    so the frozen-quantizer test drives it against its own build."""
    e = load(spark, sf_dir).embeddings
    cent = spark.read.parquet(os.path.join(root, "centroids"))
    new = e.where(F.col("vec_id") > cutoff)
    new_assign = _kmeans_assign(_unit_embeddings(new), cent)
    (
        _join_doc_meta_1to1(new_assign, load(spark, sf_dir).documents, ["lang"])
        .select("vec_id", "u", "lang", "cell")
        .repartition("cell")
        .sortWithinPartitions("vec_id")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(os.path.join(root, "cells"))
    )


# Quantizer-INDEPENDENT provenance rollup of the kmeans maintenance family
# (cell assignments are trained — ROWS-only by construction — but per-part
# counts/checksums/id-ranges over the merged index equal the same split
# computed relationally, because the guarded 1:1 build contract means the
# index holds exactly the embeddings table). Shared by sink_ivf_append_kmeans,
# stream_ivf_append_kmeans, and sink_ivf_compact_kmeans: the streaming ingest
# converges to the batch append, and the fold is lossless.
_IVF_KMEANS_PART_ORACLE = """
    WITH cut AS (SELECT CAST(floor(0.8 * max(vec_id)) AS BIGINT) AS c FROM embeddings)
    SELECT CASE WHEN e.vec_id <= cut.c THEN 'base' ELSE 'appended' END AS part,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(e.vec_id) AS BIGINT) AS vecid_sum,
           CAST(min(e.vec_id) AS BIGINT) AS vec_min,
           CAST(max(e.vec_id) AS BIGINT) AS vec_max
    FROM embeddings e CROSS JOIN cut GROUP BY 1
    """


def _ivf_kmeans_part_rollup(back: DataFrame, cutoff: int) -> DataFrame:
    """The readback side of _IVF_KMEANS_PART_ORACLE, shared by the three
    kmeans maintenance ops."""
    return back.groupBy(
        F.when(F.col("vec_id") <= cutoff, "base").otherwise("appended").alias("part")
    ).agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.sum("vec_id").cast("bigint").alias("vecid_sum"),
        F.min("vec_id").cast("bigint").alias("vec_min"),
        F.max("vec_id").cast("bigint").alias("vec_max"),
    )


@op("sink_ivf_append_kmeans", oracle=_IVF_KMEANS_PART_ORACLE)
def sink_ivf_append_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance on the DEPLOYMENT (√n trained kmeans)
    quantizer — the append verb that makes its lifecycle symmetric with
    the label index (build/serve/filtered-serve/DELETE existed after r13;
    the daily-crawl append is what a deployment actually runs between
    rebuilds): the newest ~20% of vectors (vec_id above the 0.8-of-max
    cutoff, the dedup_incremental split convention) are assigned to the
    EXISTING cells of a quantizer trained on the BASE corpus only and
    written ``mode("append")`` into the cell-partitioned layout —
    O(new × k) against broadcast centroids, no retraining, base files
    never rewritten (byte-identity pinned).

    The frozen-quantizer principle is enforced structurally: the append
    reads the centroids BACK FROM THE INDEX (the quantizer ships with it
    — scan_ivf_probe_kmeans's serve-time contract) and routes assignment
    through the same _kmeans_assign body the build uses, so
    build-assignment and append-assignment cannot drift. Quantizer drift
    against the growing corpus is absorbed by the periodic rebuild +
    rebalance cadence, exactly as on the label index.

    Rollup (EXACT, quantizer-independent — cell assignments are trained,
    ROWS-only by construction everywhere else in this family): per part
    (base/appended), count + exact vec_id checksum + id range over the
    merged readback; the guarded 1:1 build contract means the merged
    index holds exactly the embeddings table, so the oracle recomputes
    the same split relationally. Append-side probe mechanics (new
    vectors reachable, base members' files untouched) are pinned by
    tests/test_invariants.py::test_ivf_kmeans_append_frozen_quantizer."""
    e = load(spark, sf_dir).embeddings
    cutoff = e.agg(
        F.floor(F.lit(0.8) * F.max("vec_id")).cast("bigint").alias("c")
    ).collect()[0]["c"]
    root = _write_ivf_kmeans_index(spark, sf_dir, max_vec_id=cutoff, root_name="embeddings_ivf_kmeans_incr")
    _ivf_kmeans_append(spark, sf_dir, root, cutoff)
    return _ivf_kmeans_part_rollup(spark.read.parquet(os.path.join(root, "cells")), cutoff)

def _retrain_recover(
    root: str,
    quant: str = "centroids",
    members: str = "cells",
    retired_name: str = "quantizer_retired",
) -> None:
    """Recovery/commit body of the quantizer-RETRAIN swap (sink_ivf_retrain):
    drive the (centroids, cells) generation swap forward from WHATEVER state
    the directories are in. The commit point is staging completion — both
    halves of ``retrain_next/`` carry parquet _SUCCESS; every later step is a
    single atomic rename, and this function resumes the sequence from the
    unique state the directory layout encodes, so a crash anywhere in the
    cutover rolls FORWARD on the next call (a serve call runs this preamble,
    which is what makes probe answers continuous across the cutover). An
    INCOMPLETE staging is discarded — the retrain never committed, the old
    generation keeps serving. Old centroids retire to ``quantizer_retired``
    (the audit trail: WHICH quantizer served before the refresh); old cells
    are dropped — their members live on, reassigned, in the new generation.

    Swap sequence (presence of each path identifies progress exactly):
      A1 cells        -> cells_old          A2 centroids -> centroids_old
      B1 staged cents -> centroids          B2 staged cells -> cells
      C  centroids_old -> quantizer_retired; rmtree cells_old, retrain_next

    Raises on states the discipline does not own (e.g. cells missing with no
    staged replacement) — that is outside data loss, never silently rebuilt.

    ``quant``/``members``/``retired`` parameterize the pair so the SAME
    recover body drives both retrains: the kmeans index swaps
    (centroids, cells) with the old quantizer retiring to
    quantizer_retired; the PQ index swaps (codebooks, codes) with
    codebooks_retired (sink_pq_retrain)."""
    import shutil as _sh

    cents, cells = os.path.join(root, quant), os.path.join(root, members)
    staged = os.path.join(root, "retrain_next")
    staged_c, staged_m = os.path.join(staged, quant), os.path.join(staged, members)
    c_old = os.path.join(root, quant + "_old")
    m_old = os.path.join(root, members + "_old")

    def complete(d: str) -> bool:
        return os.path.exists(os.path.join(d, "_SUCCESS"))

    if os.path.exists(cells) and os.path.exists(cents):
        if complete(staged_c) and complete(staged_m):
            # A1 — a cells_old shell may survive a prior crash's C; renaming
            # onto an existing dir is illegal, so clear it first
            _sh.rmtree(m_old, ignore_errors=True)
            os.rename(cells, m_old)
        else:
            # no committed retrain in flight: discard any partial staging,
            # finish any interrupted cleanup (C), and we are done
            _sh.rmtree(staged, ignore_errors=True)
            if os.path.exists(c_old):
                retired = os.path.join(root, retired_name)
                _sh.rmtree(retired, ignore_errors=True)
                os.rename(c_old, retired)
            _sh.rmtree(m_old, ignore_errors=True)
            return
    if not os.path.exists(cells):
        if not os.path.exists(os.path.join(staged_m, "_SUCCESS")):
            raise FileNotFoundError(
                f"no cell layout at {cells} and no staged replacement to roll forward to"
            )
        if os.path.exists(cents) and os.path.exists(staged_c):
            _sh.rmtree(c_old, ignore_errors=True)
            os.rename(cents, c_old)  # A2
        if not os.path.exists(cents):
            if not os.path.exists(staged_c):
                raise FileNotFoundError(f"no centroids at {cents} and none staged")
            os.rename(staged_c, cents)  # B1
        elif not os.path.exists(c_old):
            raise FileNotFoundError(
                f"centroids at {cents} are pre-swap but staged centroids are gone"
            )
        os.rename(staged_m, cells)  # B2
    # C: retire the old quantizer, drop old cells and the staging shell
    if os.path.exists(c_old):
        retired = os.path.join(root, retired_name)
        _sh.rmtree(retired, ignore_errors=True)
        os.rename(c_old, retired)
    _sh.rmtree(m_old, ignore_errors=True)
    _sh.rmtree(staged, ignore_errors=True)


def _ivf_kmeans_retrain(spark: SparkSession, root: str) -> None:
    """Quantizer RETRAIN on the deployment index at ``root`` — the refresh
    verb dq_ann_index_health monitors for (mean member→centroid cosine
    drifting down as frozen-quantizer appends accumulate) and nothing else
    remedied (VERDICT r13 missing #1; sink_ivf_rebalance splits hot cells
    but never re-trains): re-fit the coarse quantizer on the CURRENT corpus
    (base ∪ appends, read back from the index; training is the same
    md5-half-sample-bounded seeded k-means|| as the build — _kmeans_cells),
    re-assign every member through the shared _kmeans_assign body, write the
    new (centroids, cells) GENERATION to a staged layout, and cut over via
    _retrain_recover's atomic-rename sequence. The full re-assign is O(n·k)
    — a retrain is inherently a full pass, which is why it runs on the
    monitoring cadence, not per append; everything between retrains stays
    O(touched).

    Single-writer discipline: refuses to run while an erasure request is in
    flight (un-retired tombstone manifest) — a retrain would reassign rows a
    committed purge is about to remove; finish the purge first."""
    if os.path.exists(os.path.join(root, "tombstones", "_SUCCESS")):
        raise RuntimeError(
            "erasure request in flight (un-retired tombstone manifest); "
            "complete the purge before retraining"
        )
    _retrain_recover(root)  # roll any prior interrupted cutover forward first
    _retrain_stage(spark, root)
    _retrain_recover(root)  # staging complete = committed; this IS the cutover


def _retrain_stage(spark: SparkSession, root: str) -> None:
    """Staging half of the retrain: train the new quantizer on the current
    members, re-assign, and write the new generation under ``retrain_next/``
    — no serving path is touched until _retrain_recover cuts over. Factored
    so the crash-window test can stop exactly at staging completion."""
    import shutil as _sh

    members = spark.read.parquet(os.path.join(root, "cells"))
    unit = members.select("vec_id", "u").repartition(embed_partitions(spark), "vec_id")
    cent = _kmeans_cells(spark, unit)
    assign = _kmeans_assign(unit, cent)
    staged = os.path.join(root, "retrain_next")
    _sh.rmtree(staged, ignore_errors=True)
    cent.df.write.mode("overwrite").parquet(os.path.join(staged, "centroids"))
    (
        members.select("vec_id", "lang")
        .join(assign, "vec_id")
        .select("vec_id", "u", "lang", "cell")
        .repartition("cell")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(staged, "cells"))
    )


@op("sink_ivf_retrain", oracle=_IVF_KMEANS_PART_ORACLE)
def sink_ivf_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantizer RETRAIN / refresh — the verb every long-lived ANN
    deployment eventually runs (VERDICT r13 missing #1): months of
    frozen-quantizer appends (sink_ivf_append_kmeans enforces frozen cells
    structurally) degrade the coarse quantizer — dq_ann_index_health's
    mean member→centroid cosine drifts down and recall decays — and until
    this op the only remedy was an out-of-band full rebuild with no
    serving-cutover discipline. Scenario graded: build the base index
    (quantizer trained on the ≤0.8-cutoff prefix), batch-append the newest
    20% against the frozen quantizer, then RETRAIN: re-fit on the current
    corpus, full re-assign, staged generation, atomic rename cutover
    (_retrain_recover — staging completion is the commit point, every
    crash window rolls forward, probes answer from a consistent
    (quantizer, cells) pair in every intermediate state), old quantizer
    retired to the ``quantizer_retired`` audit dir.

    Rollup (EXACT, quantizer-independent): the retrain REASSIGNS but never
    adds or drops a member, so the per-part count/checksum/id-range rollup
    over the post-cutover index equals the relational split the oracle
    computes — the same _IVF_KMEANS_PART_ORACLE the append/compact family
    grades against, because member provenance is invariant across the
    whole maintenance lifecycle. Fit improvement on a drifted fixture,
    member-multiset preservation, quantizer/cells consistency, and
    crash-window roll-forward are pinned by
    tests/test_invariants.py::test_ivf_kmeans_retrain_*."""
    e = load(spark, sf_dir).embeddings
    cutoff = e.agg(
        F.floor(F.lit(0.8) * F.max("vec_id")).cast("bigint").alias("c")
    ).collect()[0]["c"]
    root = _write_ivf_kmeans_index(
        spark, sf_dir, max_vec_id=cutoff, root_name="embeddings_ivf_kmeans_retrain"
    )
    _ivf_kmeans_append(spark, sf_dir, root, cutoff)
    _ivf_kmeans_retrain(spark, root)
    return _ivf_kmeans_part_rollup(spark.read.parquet(os.path.join(root, "cells")), cutoff)

def _write_books_frame(spark: SparkSession, books, path: str) -> None:
    """Persist a (PQ_M, PQ_K, PQ_SUBDIM) codebook array in the index's
    (sub, cent, dim, w) parquet layout — the single write body for every
    codebook persist site (build, meta-build, retrain staging)."""
    rows = [
        (s_, c_, d_, float(books[s_, c_, d_]))
        for s_ in range(PQ_M)
        for c_ in range(PQ_K)
        for d_ in range(PQ_SUBDIM)
    ]
    spark.createDataFrame(rows, "sub int, cent int, dim int, w double").write.mode(
        "overwrite"
    ).parquet(path)


def _pq_retrain(spark: SparkSession, sf_dir: str, root: str, vectors: DataFrame | None = None) -> None:
    """Codebook RETRAIN on the compressed index at ``root`` — the PQ half
    of the quantizer-refresh story (sink_ivf_retrain's sibling): re-train
    the per-subspace codebooks on the CURRENT corpus (the sample-bounded
    _pq_codebooks training the build uses), RE-ENCODE every held vector —
    codes are book-relative, so a codebook refresh is inherently a full
    re-encode, O(corpus) but producing the 8 B/vector compressed form, the
    same cheapest-full-pass economics as sink_pq_compact — and cut the
    (codebooks, codes) generation over via the shared _retrain_recover
    rename discipline (staging completion = the commit point; old
    codebooks retire to ``codebooks_retired`` for audit).

    Raw vectors come from the PRIMARY store (the embeddings table) — a PQ
    index is derived data and cannot be retrained from its own lossy
    codes; the held-id set still comes from the INDEX, so rows the index
    never held (or purged) are not resurrected. ``vectors`` overrides the
    primary store for the drifted-fixture test.

    Single-writer discipline: refuses to run over an un-retired erasure
    manifest, exactly as the kmeans retrain."""
    if os.path.exists(os.path.join(root, "tombstones", "_SUCCESS")):
        raise RuntimeError(
            "erasure request in flight (un-retired tombstone manifest); "
            "complete the purge before retraining"
        )
    _retrain_recover(root, "codebooks", "codes", "codebooks_retired")
    _pq_retrain_stage(spark, sf_dir, root, vectors)
    _retrain_recover(root, "codebooks", "codes", "codebooks_retired")


def _pq_retrain_stage(
    spark: SparkSession, sf_dir: str, root: str, vectors: DataFrame | None = None
) -> None:
    """Staging half of the PQ retrain: train new codebooks on the current
    held corpus, re-encode it, write the new generation under
    ``retrain_next/`` — no serving path touched until the recover cuts
    over. Factored for the crash-window test, like _retrain_stage."""
    import shutil as _sh

    if vectors is None:
        vectors = _unit_embeddings(load(spark, sf_dir).embeddings)
    held = spark.read.parquet(os.path.join(root, "codes")).select("vec_id")
    unit = vectors.join(held, "vec_id")
    books = _pq_codebooks(unit)
    staged = os.path.join(root, "retrain_next")
    _sh.rmtree(staged, ignore_errors=True)
    _write_books_frame(spark, books, os.path.join(staged, "codebooks"))
    (
        unit.mapInPandas(_pq_encode(books), "vec_id long, code long")
        .repartitionByRange(8, "vec_id")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .parquet(os.path.join(staged, "codes"))
    )


@op("sink_pq_retrain", oracle=_IVF_KMEANS_PART_ORACLE)
def sink_pq_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codebook RETRAIN / refresh on the COMPRESSED index — completes the
    refresh symmetry sink_ivf_retrain opened: both long-lived quantizers
    (the kmeans cell topology AND the PQ codebooks) now have the verb that
    remedies drift, not just the monitoring that detects it. Scenario
    graded: base codebooks trained on the ≤0.8-cutoff prefix, frozen-book
    appends accumulate the newest 20% (the drift source — appended codes
    quantize against books that never saw their distribution), then
    RETRAIN: re-fit on the current corpus, full re-encode, staged
    (codebooks, codes) generation, atomic rename cutover through the SAME
    _retrain_recover body as the kmeans retrain (parameterized pair names
    — the cutover discipline lives once), old codebooks retired to the
    audit dir. _pq_probe_from_root runs the recover preamble, so ADC
    probes answer from a consistent generation inside any crash window.

    Rollup (EXACT, quantizer-independent): the retrain re-encodes but
    never adds or drops a held id, so the per-part provenance rollup over
    the post-cutover code table equals the relational split — the shared
    maintenance-family oracle, fifth member. Reconstruction improvement
    on a drifted fixture, held-id preservation, crash-window roll-forward
    and serve continuity are pinned by
    tests/test_invariants.py::test_pq_retrain_*."""
    root, cutoff = _pq_append_parts(spark, sf_dir)
    _pq_append_codes(spark, sf_dir, root, cutoff)
    _pq_retrain(spark, sf_dir, root)
    return _ivf_kmeans_part_rollup(spark.read.parquet(os.path.join(root, "codes")), cutoff)


def _write_ivfpq_index(spark: SparkSession, sf_dir: str, max_vec_id: int | None = None) -> str:
    """Write the COMPOSED serving index — FAISS ``IVFx,PQy`` persisted
    (the form a 100 TB vector deployment actually serves from): trained
    kmeans cells bound WHICH partitions a probe reads (PartitionFilters
    on ``cell``), product quantization bounds the BYTES each read row
    costs (8 B packed codes — a 1e9-vector corpus is ~8 GB of probed-cell
    code files where the raw-vector kmeans layout holds 512 GB). Both
    models ship WITH the index (an index that does not carry its
    quantizer and codebooks cannot be probed by a fresh process). Layout:

      <root>/centroids/  (cell, c, cnrm)          — k x dim, one file
      <root>/codebooks/  (sub, cent, dim, w)      — PQ_M·PQ_K·PQ_SUBDIM rows
      <root>/cells/      partitionBy(cell) parquet (vec_id, code, lang)

    ``lang`` rides NEXT TO each code (vec_id = doc_id, 1:1 — ENFORCED by
    _join_doc_meta_1to1's raise_error gate) so attribute-predicated
    serving (scan_ivfpq_probe_filtered) is a parquet data-column pushdown
    on only the probed partitions — the _write_ivf_kmeans_index
    convention, carried to the compressed layout.

    Training lineage is the sim_knn_ivf_pq lineage exactly
    (repartition(embed_partitions, vec_id) BEFORE normalization; k-means||
    samples per partition) so the persisted build and the in-memory
    composed search train bit-identical models — the invariant test's
    restriction-equality gate rests on it. ``max_vec_id`` restricts the
    build AND both model trainings to a base-corpus prefix (the
    sink_ivfpq_append convention: appended vectors must encode and land
    under frozen models)."""
    from .scans import _scratch

    e = load(spark, sf_dir).embeddings.repartition(embed_partitions(spark), "vec_id")
    if max_vec_id is not None:
        e = e.where(F.col("vec_id") <= max_vec_id)
    unit = _unit_embeddings(e)
    cent = _kmeans_cells(spark, unit, raw=e)
    books = _pq_codebooks(unit, raw=e)
    assign = _kmeans_assign(unit, cent).select("vec_id", "cell")
    codes = unit.mapInPandas(_pq_encode(books), "vec_id long, code long")
    root = _scratch("embeddings_ivfpq")
    cent.df.write.mode("overwrite").parquet(os.path.join(root, "centroids"))
    _write_books_frame(spark, books, os.path.join(root, "codebooks"))
    (
        _join_doc_meta_1to1(
            assign.join(codes, "vec_id"), load(spark, sf_dir).documents, ["lang"]
        )
        .select("vec_id", "code", "lang", "cell")
        .repartition("cell")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(root, "cells"))
    )
    return root


@op("sink_ivfpq_layout", oracle=_IVF_KMEANS_PART_ORACLE)
def sink_ivfpq_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build verb of the composed IVF+PQ index (_write_ivfpq_index): the
    two ANN compressions persisted TOGETHER — cell-partitioned 8 B codes
    plus both shipped models. sink_ivf_layout persists the cell topology
    with raw vectors; sink_pq_append's family persists codes with no
    topology; at 100 TB neither alone suffices (raw probed cells still
    read 512 B/candidate; un-partitioned codes still scan every vector),
    so THIS is the layout the serving fleet mounts.

    Rollup (EXACT, quantizer-independent — cell assignment and codes are
    trained, ROWS-only by construction everywhere else in this family):
    per part (base/appended by the 0.8-of-max vec_id cutoff), count +
    exact vec_id checksum + id range over the cells readback; the 1:1
    encode (one code per embedding, enforced by the unit-vector lineage)
    means the layout holds exactly the embeddings table, so the oracle
    recomputes the same split relationally — the shared
    maintenance-family oracle, sixth member. Partition pruning of the
    probe path is pinned by tests/test_plans.py::
    test_ivfpq_probe_prunes_partitions."""
    e = load(spark, sf_dir).embeddings
    cutoff = e.agg(
        F.floor(F.lit(0.8) * F.max("vec_id")).cast("bigint").alias("c")
    ).collect()[0]["c"]
    root = _write_ivfpq_index(spark, sf_dir)
    return _ivf_kmeans_part_rollup(spark.read.parquet(os.path.join(root, "cells")), cutoff)


def _ivfpq_serve(spark: SparkSession, sf_dir: str, root: str, member_pred=None) -> DataFrame:
    """Serving body of the composed index: both models read back from the
    index, the md5-sampled query workload (first nibble = 0, the serving
    convention) scores the broadcast centroids for its _IVF_NPROBE
    nearest cells (_probe_cells — the same expression that assigned
    members), the probed-cell set (≤ k ids, quantizer metadata) becomes a
    static partition filter on the cell-partitioned code table — the scan
    READS ONLY PROBED PARTITIONS, and each read row is 8 B of code, both
    prunings stacked — any live tombstone manifest is masked
    (_mask_live_tombstones), and the search finishes through the shared
    composed-search body (_ivfpq_search: per-cell cogroup ADC →
    top-PQ_CAND merge → exact rescore)."""
    from .curation import HEX

    cent = spark.read.parquet(os.path.join(root, "centroids"))
    books = _read_codebooks(spark, root)
    e = load(spark, sf_dir).embeddings
    sample = (
        F.instr(F.lit(HEX), F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1)) - 1 == 0
    )
    qn = _unit_embeddings(e.where(sample))
    probes = _probe_cells(qn, cent)
    probed = [r["cell"] for r in probes.select("cell").distinct().collect()]
    members = _mask_live_tombstones(
        spark,
        root,
        spark.read.parquet(os.path.join(root, "cells")).where(F.col("cell").isin(probed)),
    )
    if member_pred is not None:
        members = members.where(member_pred)
    members = members.select(
        F.col("cell").alias("mcell"),
        F.col("vec_id").alias("mvec_id"),
        "code",
    )
    return _ivfpq_search(e, probes, members, books)


@op("scan_ivfpq_probe", oracle=None)
def scan_ivfpq_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN serving from the persisted COMPOSED index — the probe the
    sink_ivfpq_layout build exists for, and the deployment read path at
    100 TB: candidates/query ≈ nprobe·(n/k) stays bounded as k grows
    with n (the IVF half), and every candidate costs 8 B of I/O (the PQ
    half); the only full-precision vectors touched are the ≤ PQ_CAND
    exact-rescore candidates per query.

    Oracle = ROWS (SURVEY §2.0 rule 5: trained quantizer + codebooks);
    the gate is stronger than any recall floor —
    tests/test_invariants.py::test_ivfpq_probe_matches_in_memory_sibling
    pins BIT-IDENTITY with sim_knn_ivf_pq restricted to the same query
    sample (per-query computation is independent and both forms train
    identical models over the same lineage, so the persisted serve must
    reproduce the in-memory composed search exactly), plus run-stability
    and codebook roundtrip bit-exactness; partition pruning is pinned by
    tests/test_plans.py::test_ivfpq_probe_prunes_partitions."""
    root = _write_ivfpq_index(spark, sf_dir)
    return _ivfpq_serve(spark, sf_dir, root)


@op("scan_ivfpq_probe_filtered", oracle=None)
def scan_ivfpq_probe_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED serving on the composed index — the attribute-predicated
    probe every persisted layout in this repo serves (label IVF:
    scan_ivf_probe_filtered, EXACT semantics contract; kmeans:
    scan_ivf_probe_kmeans_filtered; PQ: scan_pq_probe_filtered), now on
    the layout a 100 TB deployment actually mounts. All three pruning
    layers stack: PartitionFilters on the probed cells, PushedFilters on
    the lang column riding next to each code, and 8 B per surviving row.
    The predicate sits BELOW the ADC scan and the rescore, so k is
    maintained over survivors — post-filter back-fill semantics, not a
    thinned top-5.

    Oracle = ROWS (trained models); gated by
    tests/test_invariants.py::test_ivfpq_filtered_probe_semantics —
    every neighbor satisfies the predicate, survivors of the unfiltered
    composed top-5 are retained (monotonicity), and the probe answers 5
    per query (back-fill)."""
    root = _write_ivfpq_index(spark, sf_dir)
    return _ivfpq_serve(spark, sf_dir, root, member_pred=F.col("lang") == _FILTERED_LANG)


def _ivfpq_append(spark: SparkSession, sf_dir: str, root: str, cutoff: int) -> None:
    """Append the post-cutoff vectors to the composed index at ``root``:
    BOTH models are read back from the index (frozen — the shipped
    quantizer and codebooks, never retrained), assignment routes through
    _kmeans_assign and encoding through _pq_encode exactly as the build
    does, and the new 8 B codes land mode("append") in existing cell
    directories — base files never rewritten. Factored so the
    frozen-models test drives it against its own build."""
    e = load(spark, sf_dir).embeddings
    cent = spark.read.parquet(os.path.join(root, "centroids"))
    books = _read_codebooks(spark, root)
    unit = _unit_embeddings(e.where(F.col("vec_id") > cutoff))
    assign = _kmeans_assign(unit, cent).select("vec_id", "cell")
    codes = unit.mapInPandas(_pq_encode(books), "vec_id long, code long")
    (
        _join_doc_meta_1to1(
            assign.join(codes, "vec_id"), load(spark, sf_dir).documents, ["lang"]
        )
        .select("vec_id", "code", "lang", "cell")
        .repartition("cell")
        .sortWithinPartitions("vec_id")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(os.path.join(root, "cells"))
    )


@op("sink_ivfpq_append", oracle=_IVF_KMEANS_PART_ORACLE)
def sink_ivfpq_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance on the COMPOSED index — the append verb
    that lets the layout a deployment actually mounts (sink_ivfpq_layout)
    absorb the daily crawl without a rebuild: the newest ~20% of vectors
    (above the 0.8-of-max cutoff, the dedup_incremental split convention)
    are assigned to the EXISTING cells of a quantizer trained on the BASE
    corpus only and encoded against the BASE-trained codebooks, then
    written ``mode("append")`` into the cell-partitioned code layout —
    O(new × k) assignment against broadcast centroids plus one Arrow
    encode pass over the new vectors; base files never rewritten. Both
    frozen-model principles are enforced structurally (models read back
    from the index, shared assignment/encode bodies); drift is absorbed
    by the retrain verbs (sink_ivf_retrain / sink_pq_retrain), whose
    cutover discipline this layout inherits.

    Rollup (EXACT, quantizer-independent): the shared maintenance-family
    oracle over the merged readback. Frozen-model mechanics (base-file
    byte-identity, appended vectors reachable in their frozen cells with
    frozen-book codes) are pinned by
    tests/test_invariants.py::test_ivfpq_append_frozen_models."""
    e = load(spark, sf_dir).embeddings
    cutoff = e.agg(
        F.floor(F.lit(0.8) * F.max("vec_id")).cast("bigint").alias("c")
    ).collect()[0]["c"]
    root = _write_ivfpq_index(spark, sf_dir, max_vec_id=cutoff)
    _ivfpq_append(spark, sf_dir, root, cutoff)
    return _ivf_kmeans_part_rollup(spark.read.parquet(os.path.join(root, "cells")), cutoff)
