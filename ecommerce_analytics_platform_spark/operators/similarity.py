"""Similarity search over embedding columns (``array<float>``).

Beyond the reference surface (BASELINE.json north star): approximate
nearest-neighbor search for training-data pipelines.

- :func:`cosine_topk_bruteforce` — the exact baseline: block-nested-loop
  cross join + JVM-side dot product (``aggregate``/``zip_with`` higher-order
  functions — no Python in the loop), then per-query top-k via window.
- :func:`lsh_bucketed_topk` — the scale path: random-hyperplane LSH buckets
  candidates first so the join is bucket-local instead of full N×M.
  At 100 TB / billions of vectors this is the difference between a
  broadcast-bucket join and an impossible quadratic shuffle.

Vectors are L2-normalized once up front (cosine = dot of normals).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _l2norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def normalize(df: DataFrame, vec_col: str, out_col: str = "__nvec") -> DataFrame:
    # the norm is materialized behind a Generate BEFORE the divide (r15):
    # inlined into the transform's lambda, the l2 fold is re-evaluated
    # once PER ELEMENT (interpreted HOFs hoist nothing) — O(dim²)
    # arithmetic per vector, measured as the dominant stage CPU of the
    # LSH embedding queries
    from ecommerce_analytics_platform_spark.functions.text import (
        with_materialized,
    )

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = with_materialized(df, _l2norm(v), "__l2n")
    return out.withColumn(
        out_col, F.transform(v, lambda x: x / F.col("__l2n"))
    ).drop("__l2n")


def _safe_unit_rows(M):
    """L2-normalize matrix rows in place; zero vectors stay zero instead of
    becoming NaN (guarded divide — a zero-norm row scores 0 with everything)."""
    import numpy as np

    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


def _shard_cogroup_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int,
    n_shards: int,
    score_shard,
) -> DataFrame:
    """Shared scale skeleton for exact/quantized dense top-k WITHOUT driver
    materialization: corpus hashed into ``n_shards`` shards, queries
    replicated to every shard via one ``explode(sequence(...))`` (the
    block-nested-loop row replication — |Q|·n_shards rows, unavoidable for
    exact scoring), cogroup on ``shard`` runs one BLAS matmul per
    (query batch × corpus shard), per-shard top-k under the strict total
    order (cosine DESC, cid ASC) provably contains the global top-k, and a
    final window pass reduces. Driver memory O(1); per-task memory
    O(shard_rows·dim + |Q|·dim). Same cogroup-per-partition pattern as
    :func:`ivf_topk` — the IVF list assignment is replaced by a hash."""
    c = corpus.select(
        F.pmod(F.hash(F.col(corpus_id)), F.lit(n_shards)).alias("shard"),
        F.col(corpus_id).alias("cid"),
        F.col(vec_col).alias("cvec"),
    )
    q = queries.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("shard"),
        F.col(query_id).alias("qid"),
        F.col(vec_col).alias("qvec"),
    )
    scored = (
        q.groupBy("shard")
        .cogroup(c.groupBy("shard"))
        .applyInPandas(score_shard, "qid long, cid long, cosine double")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Physical plan: corpus is broadcast when small (AQE decides); the dot
    product runs as codegen'd array ops. Score rounded for cross-engine
    comparability; ties broken by corpus id for determinism.
    """
    q = normalize(queries, vec_col, "__qv").select(F.col(query_id).alias("qid"), "__qv")
    c = normalize(corpus, vec_col, "__cv").select(F.col(corpus_id).alias("cid"), "__cv")
    scored = (
        q.crossJoin(c)
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", F.round(_dot(F.col("__qv"), F.col("__cv")), round_digits).alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )


def cosine_topk_blas(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 4,
    exclude_self: bool = True,
    broadcast_threshold: int = 100_000,
    shard_rows: int = 8192,
) -> DataFrame:
    """Exact top-k cosine neighbors via blocked BLAS matmuls.

    Two physical strategies behind one contract (score rounded to
    ``round_digits``, rank by cosine DESC then corpus id ASC, top ``k`` —
    identical to :func:`cosine_topk_bruteforce`):

    - **small corpus** (≤ ``broadcast_threshold`` rows, an explicit guard —
      at 64-d fp64 the default 100k rows is ~50 MB): collect + broadcast the
      corpus matrix, one ``Q @ C.T`` per Arrow batch of queries inside
      ``mapInPandas`` (one BLAS call instead of 25M interpreted array
      folds; 30 s → ~1 s at 5k×5k).
    - **large corpus**: NO driver materialization — the
      :func:`_shard_cogroup_topk` skeleton (hash-sharded corpus, queries
      replicated per shard, per-shard BLAS + top-k, global window reduce).
      Corpus size stops bounding driver memory; per-task footprint is
      ``shard_rows``·dim.
    """
    import numpy as np
    import pandas as pd

    n_corpus = corpus.count()
    if n_corpus > broadcast_threshold:
        def score_shard(_key, qpdf, cpdf):
            if len(qpdf) == 0 or len(cpdf) == 0:
                return pd.DataFrame({"qid": [], "cid": [], "cosine": []}).astype(
                    {"qid": "int64", "cid": "int64", "cosine": "float64"}
                )
            Q = _safe_unit_rows(np.array([list(v) for v in qpdf["qvec"]], dtype=np.float64))
            C = _safe_unit_rows(np.array([list(v) for v in cpdf["cvec"]], dtype=np.float64))
            qids = qpdf["qid"].to_numpy()
            cids = cpdf["cid"].to_numpy()
            S = np.round(Q @ C.T, round_digits)
            if exclude_self:
                S = np.where(cids[None, :] == qids[:, None], -np.inf, S)
            kk = min(k, S.shape[1])
            order = np.lexsort((np.broadcast_to(cids, S.shape), -S), axis=1)[:, :kk]
            rows = np.repeat(np.arange(S.shape[0]), kk)
            cols = order.ravel()
            keep = np.isfinite(S[rows, cols])
            return pd.DataFrame(
                {"qid": qids[rows[keep]], "cid": cids[cols[keep]], "cosine": S[rows[keep], cols[keep]]}
            )

        n_shards = max(1, -(-n_corpus // shard_rows))
        return _shard_cogroup_topk(
            queries, corpus, query_id, corpus_id, vec_col, k, n_shards, score_shard
        )

    rows = corpus.select(corpus_id, vec_col).collect()
    cids = np.array([r[0] for r in rows], dtype=np.int64)
    C = _safe_unit_rows(np.array([list(r[1]) for r in rows], dtype=np.float64))
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast((cids, C))
    buffer = min(len(cids), k + 128)  # tie-safety margin around the k-th score

    def score(batches):
        b_cids, b_C = bc.value
        for pdf in batches:
            Q = _safe_unit_rows(np.array([list(v) for v in pdf["__vec"]], dtype=np.float64))
            S = np.round(Q @ b_C.T, round_digits)
            qids = pdf["__qid"].to_numpy()
            out_q, out_c, out_s, out_r = [], [], [], []
            for i in range(S.shape[0]):
                s = S[i]
                if exclude_self:
                    s = np.where(b_cids == qids[i], -np.inf, s)
                cand = np.argpartition(-s, buffer - 1)[:buffer]
                order = cand[np.lexsort((b_cids[cand], -s[cand]))][:k]
                order = order[np.isfinite(s[order])]  # never emit masked self
                out_q.extend([qids[i]] * len(order))
                out_c.extend(b_cids[order])
                out_s.extend(s[order])
                out_r.extend(range(1, len(order) + 1))
            yield pd.DataFrame(
                {"qid": out_q, "cid": out_c, "cosine": out_s, "rank": out_r}
            )

    prepared = queries.select(
        F.col(query_id).alias("__qid"), F.col(vec_col).alias("__vec")
    ).repartition(spark.sparkContext.defaultParallelism)
    return prepared.mapInPandas(score, "qid long, cid long, cosine double, rank int")


def _train_centroids(
    corpus: DataFrame,
    corpus_id: str,
    vec_col: str,
    n_lists: int,
    kmeans_iters: int,
    seed: int,
):
    """Deterministic spherical k-means on a seeded driver-side sample
    (id-ordered limit ⇒ stable across partitionings; centroid count × dim
    floats — tiny). Shared coarse quantizer for IVF search and semantic
    dedup."""
    import numpy as np

    sample = np.array(
        [
            list(r[0])
            for r in corpus.select(vec_col)
            .orderBy(F.col(corpus_id))
            .limit(max(n_lists * 32, 512))
            .collect()
        ],
        dtype=np.float64,
    )
    sample = _safe_unit_rows(sample)
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), n_lists, replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(n_lists):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / np.linalg.norm(v)
    return centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 5,
    seed: int = 42,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) coarse quantization.

    Train: deterministic k-means on a seeded driver-side sample (centroid
    count × dim floats — tiny). Index: every corpus vector assigned to its
    nearest centroid (one BLAS pass, broadcast centroids). Search: each
    query scores only the vectors in its ``n_probe`` nearest lists, then
    exact cosine re-rank with the same (cosine DESC, id ASC) contract as
    the exact path.

    Scale shape: the corpus partition-by-list IS the IVF index — at
    billions of vectors, persist ``assigned`` partitioned by ``list_id``
    and the probe cogroup partition-prunes. Recall tuning = n_probe/n_lists.

    Scoring runs as ONE BLAS matmul per (list × cogroup batch) inside
    ``applyInPandas`` over a cogroup on ``list_id`` — never as a row-level
    pair join (an interpreted ``aggregate`` fold per candidate pair was
    measured 25× slower at 2k×2k×64d). Per-list exact top-k under the
    total order (cosine DESC, cid ASC) is kept per query; the union of
    per-list top-k provably contains the global top-k over probed lists,
    so a final window pass yields identical results to pair-join scoring.
    """
    import numpy as np

    spark = queries.sparkSession
    centroids = _train_centroids(
        corpus, corpus_id, vec_col, n_lists, kmeans_iters, seed
    )
    bc = spark.sparkContext.broadcast(centroids)

    def assign_lists(n_lists_probe: int):
        import pandas as pd

        def fn(batches):
            C = bc.value
            for pdf in batches:
                V = np.array([list(v) for v in pdf["__vec"]], dtype=np.float64)
                V /= np.linalg.norm(V, axis=1, keepdims=True)
                S = V @ C.T
                top = np.argsort(-S, axis=1)[:, :n_lists_probe]
                out_id, out_list, out_vec = [], [], []
                for i, vid in enumerate(pdf["__id"]):
                    for c in top[i]:
                        out_id.append(vid)
                        out_list.append(int(c))
                        out_vec.append(V[i].tolist())
                yield pd.DataFrame({"__id": out_id, "list_id": out_list, "__nvec": out_vec})

        return fn

    assigned = (
        corpus.select(F.col(corpus_id).alias("__id"), F.col(vec_col).alias("__vec"))
        .mapInPandas(assign_lists(1), "__id long, list_id int, __nvec array<double>")
        .withColumnsRenamed({"__id": "cid", "__nvec": "cvec"})
    )
    probes = (
        queries.select(F.col(query_id).alias("__id"), F.col(vec_col).alias("__vec"))
        .mapInPandas(assign_lists(n_probe), "__id long, list_id int, __nvec array<double>")
        .withColumnsRenamed({"__id": "qid", "__nvec": "qvec"})
    )

    def score_list(_key, qpdf, cpdf):
        import pandas as pd

        if len(qpdf) == 0 or len(cpdf) == 0:
            return pd.DataFrame({"qid": [], "cid": [], "cosine": []}).astype(
                {"qid": "int64", "cid": "int64", "cosine": "float64"}
            )
        Q = np.array([list(v) for v in qpdf["qvec"]], dtype=np.float64)
        C = np.array([list(v) for v in cpdf["cvec"]], dtype=np.float64)
        qids = qpdf["qid"].to_numpy()
        cids = cpdf["cid"].to_numpy()
        S = np.round(Q @ C.T, round_digits)
        S = np.where(cids[None, :] == qids[:, None], -np.inf, S)  # exclude self
        kk = min(k, S.shape[1])
        # exact per-list top-k under (cosine DESC, cid ASC): total order ⇒
        # union over probed lists contains the global top-k.
        order = np.lexsort((np.broadcast_to(cids, S.shape), -S), axis=1)[:, :kk]
        rows = np.repeat(np.arange(S.shape[0]), kk)
        cols = order.ravel()
        keep = np.isfinite(S[rows, cols])
        return pd.DataFrame(
            {"qid": qids[rows[keep]], "cid": cids[cols[keep]], "cosine": S[rows[keep], cols[keep]]}
        )

    scored = (
        probes.groupBy("list_id")
        .cogroup(assigned.groupBy("list_id"))
        .applyInPandas(score_list, "qid long, cid long, cosine double")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.35,
    round_digits: int = 4,
    broadcast_threshold: int = 100_000,
    block_rows: int = 8192,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a < b) with
    round(cosine, round_digits) >= threshold.

    - **small corpus** (≤ ``broadcast_threshold`` rows): broadcast +
      blocked-BLAS like :func:`cosine_topk_blas` — one matmul per Arrow
      batch, emit only above-threshold pairs, so the output (not the O(n²)
      score matrix) is what hits the network.
    - **large corpus**: block-pair grouping, no driver materialization.
      Rows are hashed into B = ceil(n/block_rows) blocks; each row is
      replicated to the B groups keyed (min(b,o), max(b,o)) — every
      unordered block pair (and each diagonal block) is scored by exactly
      one ``applyInPandas`` task as a single BLAS matmul, emitting pairs
      with id_a < id_b (each unordered id pair appears in exactly one
      group, so no dedup pass is needed). Per-task memory is
      O(2·block_rows·dim); shuffle is n·B rows — the inherent cost of
      EXACT all-pairs. At 10⁹+ vectors use the approximate prefilters
      (:func:`lsh_bucketed_topk` buckets / MinHash-LSH) and reserve this
      operator for in-bucket verification.
    """
    import numpy as np
    import pandas as pd

    n = df.count()
    if n > broadcast_threshold:
        n_blocks = max(1, -(-n // block_rows))
        base = df.select(
            F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks)).alias("blk"),
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__vec"),
        )
        grouped = base.select(
            "blk",
            "__id",
            "__vec",
            F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("other"),
        ).select(
            F.least("blk", "other").alias("glo"),
            F.greatest("blk", "other").alias("ghi"),
            "blk",
            "__id",
            "__vec",
        )

        def score_pair(key, pdf):
            glo, ghi = key
            A = pdf[pdf["blk"] == glo]
            if glo == ghi:
                B = A
            else:
                B = pdf[pdf["blk"] == ghi]
            if len(A) == 0 or len(B) == 0:
                return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                    {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
                )
            MA = _safe_unit_rows(np.array([list(v) for v in A["__vec"]], dtype=np.float64))
            MB = _safe_unit_rows(np.array([list(v) for v in B["__vec"]], dtype=np.float64))
            ida = A["__id"].to_numpy()
            idb = B["__id"].to_numpy()
            S = np.round(MA @ MB.T, round_digits)
            if glo == ghi:
                # same matrix on both sides: id_a < id_b keeps each
                # unordered pair once and kills the diagonal
                mask = (S >= threshold) & (ida[:, None] < idb[None, :])
                ii, jj = np.nonzero(mask)
                a, b = ida[ii], idb[jj]
            else:
                # disjoint blocks: every pair appears exactly once here —
                # emit all hits, canonicalized to (min id, max id)
                ii, jj = np.nonzero(S >= threshold)
                a = np.minimum(ida[ii], idb[jj])
                b = np.maximum(ida[ii], idb[jj])
            return pd.DataFrame({"id_a": a, "id_b": b, "cosine": S[ii, jj]})

        return grouped.groupBy("glo", "ghi").applyInPandas(
            score_pair, "id_a long, id_b long, cosine double"
        )

    rows = df.select(id_col, vec_col).collect()
    cids = np.array([r[0] for r in rows], dtype=np.int64)
    C = _safe_unit_rows(np.array([list(r[1]) for r in rows], dtype=np.float64))
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((cids, C))

    def score(batches):
        b_cids, b_C = bc.value
        for pdf in batches:
            Q = _safe_unit_rows(np.array([list(v) for v in pdf["__vec"]], dtype=np.float64))
            S = np.round(Q @ b_C.T, round_digits)
            qids = pdf["__qid"].to_numpy()
            out_a, out_b, out_s = [], [], []
            for i in range(S.shape[0]):
                mask = (S[i] >= threshold) & (b_cids > qids[i])  # a < b once
                for j in np.nonzero(mask)[0]:
                    out_a.append(qids[i])
                    out_b.append(b_cids[j])
                    out_s.append(S[i, j])
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_s})

    prepared = df.select(
        F.col(id_col).alias("__qid"), F.col(vec_col).alias("__vec")
    ).repartition(spark.sparkContext.defaultParallelism)
    return prepared.mapInPandas(score, "id_a long, id_b long, cosine double")


def hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic random hyperplanes — tiny (n_planes × dim floats),
    embedded as literals so signature scoring is broadcast by construction.
    Shared by the Spark operators AND the DuckDB oracle builders (same
    seed → bit-identical plane literals on both sides)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def _plane_signature(planes: list[list[float]]):
    def signature(v: Column) -> Column:
        sig = F.lit(0).cast("long")
        for i, p in enumerate(planes):
            lit = F.array(*[F.lit(x) for x in p])
            sig = sig + F.when(_dot(v, lit) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        return sig

    return signature


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 7,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH signature → join within
    bucket → exact cosine re-rank inside the bucket.

    Hyperplanes are generated deterministically from ``seed`` on the driver
    (tiny: n_planes × dim floats) and embedded as literals — broadcast by
    construction, no shuffle to score signatures.
    """
    from ecommerce_analytics_platform_spark.session import fan_out

    dim = len(corpus.select(vec_col).first()[0])
    signature = _plane_signature(hyperplanes(dim, n_planes, seed))
    # signature scoring (n_planes interpreted dot products per vector) is the
    # CPU-heavy stage — spread it across cores before computing
    queries = fan_out(queries.select(query_id, vec_col))
    corpus = fan_out(corpus.select(corpus_id, vec_col))

    q = normalize(queries, vec_col, "__qv").select(
        F.col(query_id).alias("qid"), "__qv", signature(F.col("__qv")).alias("bucket")
    )
    c = normalize(corpus, vec_col, "__cv").select(
        F.col(corpus_id).alias("cid"), "__cv", signature(F.col("__cv")).alias("bucket")
    )

    # In-bucket scoring as one numpy matmul per bucket cogroup (r15,
    # guide §4.2): the bucket equi-join + interpreted zip_with/aggregate
    # dot per candidate pair was ~10 s of summed stage CPU at sf0.1.
    # Bucket assignment and normalization stay JVM-side and bit-identical
    # to the oracle; only the dot's accumulation order changes (BLAS vs
    # left fold) — absorbed by round(·, round_digits) exactly as in
    # cosine_topk_blas. Per-bucket top-k under the strict
    # (cosine DESC, cid ASC) order is the global top-k (a query scores
    # only within its own bucket).
    import numpy as np
    import pandas as pd

    qid_t = queries.schema[query_id].dataType.simpleString()
    cid_t = corpus.schema[corpus_id].dataType.simpleString()

    def score_bucket(_key, qpdf, cpdf):
        if len(qpdf) == 0 or len(cpdf) == 0:
            return pd.DataFrame({"qid": [], "cid": [], "cosine": []})
        Q = np.array([list(v) for v in qpdf["__qv"]], dtype=np.float64)
        C = np.array([list(v) for v in cpdf["__cv"]], dtype=np.float64)
        qids = qpdf["qid"].to_numpy()
        cids = cpdf["cid"].to_numpy()
        S = np.round(Q @ C.T, round_digits)
        S = np.where(cids[None, :] == qids[:, None], -np.inf, S)
        kk = min(k, S.shape[1])
        order = np.lexsort((np.broadcast_to(cids, S.shape), -S), axis=1)[:, :kk]
        rows = np.repeat(np.arange(S.shape[0]), kk)
        cols = order.ravel()
        keep = np.isfinite(S[rows, cols])
        return pd.DataFrame(
            {
                "qid": qids[rows[keep]],
                "cid": cids[cols[keep]],
                "cosine": S[rows[keep], cols[keep]],
            }
        )

    scored = (
        q.groupBy("bucket")
        .cogroup(c.groupBy("bucket"))
        .applyInPandas(score_bucket, f"qid {qid_t}, cid {cid_t}, cosine double")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )


def int8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
    rerank_factor: int = 4,
    round_digits: int = 4,
    exclude_self: bool = True,
    broadcast_threshold: int = 100_000,
    shard_rows: int = 8192,
) -> DataFrame:
    """Quantized-score top-k with exact rerank — the memory-bound scale path.

    Corpus vectors are L2-normalized then symmetrically quantized to int8
    (per-vector max-abs scale): 4× fewer broadcast/scan bytes than fp32,
    8× vs the fp64 exact path. Scoring runs the approximate pass on the
    int8 matrix (one integer-promoted matmul per Arrow batch), takes the
    top ``k × rerank_factor`` candidates per query, then reranks ONLY those
    against the fp64 originals — output semantics match
    :func:`cosine_topk_blas` whenever the true top-k survives the candidate
    cut (recall is pytest-asserted, and rises with ``rerank_factor``).

    At 10⁹ corpus vectors the approximate pass is what streams through
    memory/network, so its 4× compression is a direct 4× on the dominant
    cost; the rerank touches k·rerank_factor fp64 rows per query. Above
    ``broadcast_threshold`` corpus rows the op switches to the
    :func:`_shard_cogroup_topk` skeleton (quantization happens per shard —
    the scale is per-VECTOR, so shard boundaries cannot change any score)
    and the driver never holds the matrix.
    """
    import numpy as np
    import pandas as pd

    def _quantize(C):
        scale = np.abs(C).max(axis=1, keepdims=True) / 127.0
        scale[scale == 0] = 1.0
        return np.floor(C / scale + 0.5).astype(np.int8), scale.ravel()

    n_corpus = corpus.count()
    n_cand_target = max(k * rerank_factor, k + 8)

    if n_corpus > broadcast_threshold:
        def score_shard(_key, qpdf, cpdf):
            if len(qpdf) == 0 or len(cpdf) == 0:
                return pd.DataFrame({"qid": [], "cid": [], "cosine": []}).astype(
                    {"qid": "int64", "cid": "int64", "cosine": "float64"}
                )
            Q = _safe_unit_rows(np.array([list(v) for v in qpdf["qvec"]], dtype=np.float64))
            C = _safe_unit_rows(np.array([list(v) for v in cpdf["cvec"]], dtype=np.float64))
            cids = cpdf["cid"].to_numpy()
            qids = qpdf["qid"].to_numpy()
            C8, scale = _quantize(C)
            S_approx = (Q.astype(np.float32) @ C8.astype(np.float32).T) * scale[None, :]
            n_cand = min(len(cids), n_cand_target)
            out_q, out_c, out_s = [], [], []
            for i in range(S_approx.shape[0]):
                s_a = S_approx[i]
                if exclude_self:
                    s_a = np.where(cids == qids[i], -np.inf, s_a)
                cand = np.argpartition(-s_a, n_cand - 1)[:n_cand]
                s_e = np.round(C[cand] @ Q[i], round_digits)
                if exclude_self:
                    s_e = np.where(cids[cand] == qids[i], -np.inf, s_e)
                sel = np.lexsort((cids[cand], -s_e))[: min(k, len(cand))]
                sel = sel[np.isfinite(s_e[sel])]
                out_q.extend([qids[i]] * len(sel))
                out_c.extend(cids[cand[sel]])
                out_s.extend(s_e[sel])
            return pd.DataFrame({"qid": out_q, "cid": out_c, "cosine": out_s})

        n_shards = max(1, -(-n_corpus // shard_rows))
        return _shard_cogroup_topk(
            queries, corpus, query_id, corpus_id, vec_col, k, n_shards, score_shard
        )

    rows = corpus.select(corpus_id, vec_col).collect()
    cids = np.array([r[0] for r in rows], dtype=np.int64)
    C = _safe_unit_rows(np.array([list(r[1]) for r in rows], dtype=np.float64))
    C8, scale = _quantize(C)
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast((cids, C8, scale, C))
    n_cand = min(len(cids), n_cand_target)

    def score(batches):
        b_cids, b_C8, b_scale, b_C = bc.value
        # int8 codes promoted once per executor; the broadcast itself stays 4x small
        b_C8f = b_C8.astype(np.float32)
        for pdf in batches:
            Q = _safe_unit_rows(np.array([list(v) for v in pdf["__vec"]], dtype=np.float64))
            # approximate scores: (Q @ C8.T) * scale  ==  Q @ C_quantized.T
            S_approx = (Q.astype(np.float32) @ b_C8f.T) * b_scale[None, :]
            qids = pdf["__qid"].to_numpy()
            out_q, out_c, out_s, out_r = [], [], [], []
            for i in range(S_approx.shape[0]):
                s_a = S_approx[i]
                if exclude_self:
                    s_a = np.where(b_cids == qids[i], -np.inf, s_a)
                cand = np.argpartition(-s_a, n_cand - 1)[:n_cand]
                # exact rerank of the surviving candidates only; emit the
                # MASKED reranked score so a surviving self row is dropped,
                # never resurface with cosine ~1.0
                s_e = np.round(b_C[cand] @ Q[i], round_digits)
                if exclude_self:
                    s_e = np.where(b_cids[cand] == qids[i], -np.inf, s_e)
                sel = np.lexsort((b_cids[cand], -s_e))[: min(k, len(cand))]
                sel = sel[np.isfinite(s_e[sel])]
                out_q.extend([qids[i]] * len(sel))
                out_c.extend(b_cids[cand[sel]])
                out_s.extend(s_e[sel])
                out_r.extend(range(1, len(sel) + 1))
            yield pd.DataFrame(
                {"qid": out_q, "cid": out_c, "cosine": out_s, "rank": out_r}
            )

    prepared = queries.select(
        F.col(query_id).alias("__qid"), F.col(vec_col).alias("__vec")
    ).repartition(queries.sparkSession.sparkContext.defaultParallelism)
    return prepared.mapInPandas(score, "qid long, cid long, cosine double, rank int")


def lsh_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_planes: int = 6,
    seed: int = 7,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate embedding near-dup pairs: only pairs colliding in the
    random-hyperplane LSH bucket are scored — the SCALE companion to the
    exact :func:`cosine_neardup_pairs` (whose block-pair path must ship
    n·B rows for exactness). Here the only shuffle is the bucket-key join;
    recall follows the LSH collision bound (high-cosine pairs agree on
    most hyperplane signs, so few planes ⇒ high recall at near-dup
    thresholds). Output: (id_a < id_b, cosine ≥ threshold) — a strict
    subset of the exact operator's output by construction.
    """
    from ecommerce_analytics_platform_spark.session import fan_out

    dim = len(df.select(vec_col).first()[0])
    signature = _plane_signature(hyperplanes(dim, n_planes, seed))
    base = fan_out(df.select(id_col, vec_col))
    n = normalize(base, vec_col, "__nv").select(
        F.col(id_col).alias("__id"), "__nv", signature(F.col("__nv")).alias("bucket")
    )
    # In-bucket pair scoring as one numpy matmul per bucket (r15, guide
    # §4.2 — same rationale and bit-robustness argument as
    # lsh_bucketed_topk: normalization and bucket signs stay JVM-side;
    # only the dot accumulation order changes, absorbed by the rounding).
    import numpy as np
    import pandas as pd

    id_t = df.schema[id_col].dataType.simpleString()

    def score_bucket(_key, pdf):
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        V = np.array([list(v) for v in pdf["__nv"]], dtype=np.float64)
        ids = pdf["__id"].to_numpy()
        S = np.round(V @ V.T, round_digits)
        ia, ib = np.where((ids[:, None] < ids[None, :]) & (S >= threshold))
        return pd.DataFrame(
            {"id_a": ids[ia], "id_b": ids[ib], "cosine": S[ia, ib]}
        )

    return n.groupBy("bucket").applyInPandas(
        score_bucket, f"id_a {id_t}, id_b {id_t}, cosine double"
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    tau: float = 0.95,
    n_lists: int = 16,
    kmeans_iters: int = 5,
    seed: int = 42,
    max_cluster: int = 100_000,
    round_digits: int = 6,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with a deterministic spherical
    k-means coarse quantizer, then inside each cluster greedily keep a
    representative and drop any vector whose cosine to an already-kept
    vector is >= ``tau``. Keeper policy: ascending id order (the
    lowest-id member of a duplicate neighborhood survives) — fully
    deterministic, like operators/dedup.py's cluster keeper.

    Output: ``(id, list_id, kept, dup_of, overflow)`` — ``dup_of`` is the
    kept id that shadowed a dropped row (null on kept rows), always a
    ``kept=true`` id in the same cluster, with cosine(id, dup_of) >= tau
    by construction (both invariants oracle-checked by the registry's
    ``semantic_dedup`` contract query and pytest).

    Scale shape: the cluster partition bounds the quadratic — the only
    shuffle is the groupBy(list_id); per-cluster scoring is one BLAS
    ``V @ V.T``. Clusters larger than ``max_cluster`` skip the quadratic
    pass entirely (all rows kept, ``overflow=true`` — same guardrail
    contract as the LSH ``max_bucket`` cap); at 100 TB raise ``n_lists``
    so E[cluster] = N/n_lists stays bounded.
    """
    import numpy as np

    spark = df.sparkSession
    centroids = _train_centroids(df, id_col, vec_col, n_lists, kmeans_iters, seed)
    bc = spark.sparkContext.broadcast(centroids)

    def assign(batches):
        import pandas as pd

        C = bc.value
        for pdf in batches:
            V = _safe_unit_rows(np.array([list(v) for v in pdf["__vec"]], dtype=np.float64))
            lists = np.argmax(V @ C.T, axis=1).astype("int32")
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"],
                    "list_id": lists,
                    "__nvec": [v.tolist() for v in V],
                }
            )

    # (r15 negative result, measured: fan_out before the assign pass +
    # an explicit repartition(list_id) before applyInPandas — the §2.5
    # spread pattern — read 1.7-2.1 s vs 1.5-1.6 s as-is at sf0.1. Every
    # stage of this query runs single-task locally, but the SUMMED stage
    # CPU is only ~1.6 s, under the cost of the extra exchanges. At
    # cluster scale the scan arrives pre-split and n_lists is raised, so
    # the single-task shape is a small-input artifact, not a scale risk.)
    assigned = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec")
    ).mapInPandas(assign, "__id long, list_id int, __nvec array<double>")

    def dedup_cluster(key, pdf):
        import pandas as pd

        ids = pdf["__id"].to_numpy()
        n = len(ids)
        if n > max_cluster:
            return pd.DataFrame(
                {
                    "id": ids,
                    "list_id": np.full(n, key[0], dtype="int32"),
                    "kept": np.ones(n, dtype=bool),
                    "dup_of": pd.array([None] * n, dtype="Int64"),
                    "overflow": np.ones(n, dtype=bool),
                }
            )
        order = np.argsort(ids, kind="stable")
        V = np.array([list(v) for v in pdf["__nvec"]], dtype=np.float64)
        S = np.round(V @ V.T, round_digits)
        kept: list[int] = []
        dup_of = np.full(n, -1, dtype=np.int64)
        for i in order:
            if kept:
                sims = S[i, kept]
                j = int(np.argmax(sims))
                if sims[j] >= tau:
                    # best-scoring kept shadow, ties to the lowest id
                    best = sims[j]
                    cands = [kept[t] for t in range(len(kept)) if sims[t] == best]
                    dup_of[i] = ids[min(cands, key=lambda t: ids[t])]
                    continue
            kept.append(i)
        return pd.DataFrame(
            {
                "id": ids,
                "list_id": np.full(n, key[0], dtype="int32"),
                "kept": dup_of == -1,
                "dup_of": pd.array(
                    [None if d == -1 else int(d) for d in dup_of], dtype="Int64"
                ),
                "overflow": np.zeros(n, dtype=bool),
            }
        )

    return assigned.groupBy("list_id").applyInPandas(
        dedup_cluster, "id long, list_id int, kept boolean, dup_of long, overflow boolean"
    )


def random_projection(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    out_dim: int = 8,
    seed: int = 19,
    round_digits: int = 4,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: reduce ``vec_col`` to
    ``out_dim`` dimensions with a seeded Gaussian matrix scaled by
    1/sqrt(out_dim) (distance-preserving in expectation — the classic
    cheap dimensionality reduction in front of clustering / ANN over
    billions of embeddings).

    The projection matrix reuses :func:`hyperplanes` (seeded, driver-side,
    out_dim × dim floats) embedded as literals — broadcast by
    construction, evaluated as codegen'd array folds, ZERO shuffle: the
    operator is a pure map over the corpus, which is the whole point at
    100 TB. Output is exploded ``(id, dim_idx, value)`` rows (hash-stable
    cross-engine, no array-format ambiguity); components are rounded to
    ``round_digits`` so the fold's summation (same left-to-right order in
    Spark ``aggregate`` and DuckDB ``list_sum``) hash-matches exactly.
    """
    import math

    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, out_dim, seed)
    scale = 1.0 / math.sqrt(out_dim)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    comps = F.array(
        *[
            F.round(_dot(v, F.array(*[F.lit(x) for x in p])) * F.lit(scale), round_digits)
            for p in planes
        ]
    )
    return df.select(
        F.col(id_col).alias("vec_id"), F.posexplode(comps).alias("dim_idx", "value")
    )


def pq_train_codebooks(
    corpus: DataFrame,
    corpus_id: str,
    vec_col: str,
    m: int = 8,
    k_codes: int = 16,
    kmeans_iters: int = 5,
    seed: int = 5151,
):
    """Product-quantization codebooks (Jégou et al. 2011): split the
    L2-normalized vector into ``m`` subvectors and run an independent
    k-means (``k_codes`` centroids, Euclidean) per subspace on a seeded,
    id-ordered driver-side sample — the same deterministic-sample
    discipline as :func:`_train_centroids`. Returns an
    ``(m, k_codes, dim/m)`` float64 array, KBs even for billion-row
    corpora (the codebooks are sample-trained; encoding is distributed).
    """
    import numpy as np

    sample = np.array(
        [
            list(r[0])
            for r in corpus.select(vec_col)
            .orderBy(F.col(corpus_id))
            .limit(max(k_codes * 64, 1024))
            .collect()
        ],
        dtype=np.float64,
    )
    sample = _safe_unit_rows(sample)
    if sample.shape[0] < k_codes:
        raise ValueError(
            f"PQ training needs at least k_codes={k_codes} sample rows; "
            f"corpus sample has only {sample.shape[0]} — lower k_codes or "
            "supply a larger corpus"
        )
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.RandomState(seed)
    books = np.zeros((m, k_codes, sub))
    for j in range(m):
        X = sample[:, j * sub : (j + 1) * sub]
        centroids = X[rng.choice(len(X), k_codes, replace=False)].copy()
        for _ in range(kmeans_iters):
            d2 = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k_codes):
                members = X[assign == c]
                if len(members):
                    centroids[c] = members.mean(axis=0)
        books[j] = centroids
    return books


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    k_codes: int = 16,
    rerank_factor: int = 4,
    round_digits: int = 4,
    exclude_self: bool = True,
    broadcast_threshold: int = 100_000,
    shard_rows: int = 8192,
    kmeans_iters: int = 5,
    seed: int = 5151,
) -> DataFrame:
    """Product-quantized ANN with asymmetric distance (ADC) + exact
    rerank — the MEMORY-bound scale path past int8: each corpus vector
    compresses to ``m`` byte codes (64-dim fp64 → 8 bytes = 64×), so at
    10⁹ vectors the approximate pass streams an 8 GB code table instead
    of a 512 GB matrix. Scoring: per query batch, one tiny
    (m × k_codes) inner-product table against the codebooks, then the
    approximate score of every corpus vector is m table lookups (no
    per-vector dot product at all — the ADC trick); the top
    ``k × rerank_factor`` survivors rerank against the fp64 originals,
    exactly like :func:`int8_topk`. Codebooks are sample-trained once,
    driver-side, deterministic; above ``broadcast_threshold`` the op
    switches to the :func:`_shard_cogroup_topk` skeleton (codes computed
    per shard from the SAME global codebooks, so shard boundaries cannot
    change any score). Quality is contract-checked (recall vs the exact
    top-k) rather than hash-matched — the candidate cut is float-order
    sensitive by nature."""
    import numpy as np
    import pandas as pd

    books = pq_train_codebooks(
        corpus, corpus_id, vec_col, m=m, k_codes=k_codes,
        kmeans_iters=kmeans_iters, seed=seed,
    )
    sub = books.shape[2]
    n_cand_target = max(k * rerank_factor, k + 8)

    def _encode(C):
        codes = np.empty((len(C), m), dtype=np.uint8)
        for j in range(m):
            X = C[:, j * sub : (j + 1) * sub]
            d2 = ((X[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return codes

    def _approx_scores(Q, codes):
        # ADC: T[j] = Q_sub @ books[j].T (b × k_codes); score = Σ_j T[j][code_j]
        S = np.zeros((len(Q), len(codes)), dtype=np.float64)
        for j in range(m):
            T = Q[:, j * sub : (j + 1) * sub] @ books[j].T
            S += T[:, codes[:, j]]
        return S

    def _select(S_approx, Q, C, cids, qids):
        out_q, out_c, out_s = [], [], []
        n_cand = min(len(cids), n_cand_target)
        for i in range(S_approx.shape[0]):
            s_a = S_approx[i]
            if exclude_self:
                s_a = np.where(cids == qids[i], -np.inf, s_a)
            cand = np.argpartition(-s_a, n_cand - 1)[:n_cand]
            s_e = np.round(C[cand] @ Q[i], round_digits)
            if exclude_self:
                s_e = np.where(cids[cand] == qids[i], -np.inf, s_e)
            sel = np.lexsort((cids[cand], -s_e))[: min(k, len(cand))]
            sel = sel[np.isfinite(s_e[sel])]
            out_q.extend([qids[i]] * len(sel))
            out_c.extend(cids[cand[sel]])
            out_s.extend(s_e[sel])
        return out_q, out_c, out_s

    n_corpus = corpus.count()

    if n_corpus > broadcast_threshold:
        def score_shard(_key, qpdf, cpdf):
            if len(qpdf) == 0 or len(cpdf) == 0:
                return pd.DataFrame({"qid": [], "cid": [], "cosine": []}).astype(
                    {"qid": "int64", "cid": "int64", "cosine": "float64"}
                )
            Q = _safe_unit_rows(np.array([list(v) for v in qpdf["qvec"]], dtype=np.float64))
            C = _safe_unit_rows(np.array([list(v) for v in cpdf["cvec"]], dtype=np.float64))
            cids = cpdf["cid"].to_numpy()
            qids = qpdf["qid"].to_numpy()
            out_q, out_c, out_s = _select(_approx_scores(Q, _encode(C)), Q, C, cids, qids)
            return pd.DataFrame({"qid": out_q, "cid": out_c, "cosine": out_s})

        n_shards = max(1, -(-n_corpus // shard_rows))
        return _shard_cogroup_topk(
            queries, corpus, query_id, corpus_id, vec_col, k, n_shards, score_shard
        )

    rows = corpus.select(corpus_id, vec_col).collect()
    cids = np.array([r[0] for r in rows], dtype=np.int64)
    C = _safe_unit_rows(np.array([list(r[1]) for r in rows], dtype=np.float64))
    codes = _encode(C)
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast((cids, codes, C))

    def score(batches):
        b_cids, b_codes, b_C = bc.value
        for pdf in batches:
            Q = _safe_unit_rows(np.array([list(v) for v in pdf["__vec"]], dtype=np.float64))
            qids = pdf["__qid"].to_numpy()
            out_q, out_c, out_s = _select(
                _approx_scores(Q, b_codes), Q, b_C, b_cids, qids
            )
            out_r = []
            rank, prev = 0, None
            for q in out_q:
                rank = rank + 1 if q == prev else 1
                prev = q
                out_r.append(rank)
            yield pd.DataFrame(
                {"qid": out_q, "cid": out_c, "cosine": out_s, "rank": out_r}
            )

    prepared = queries.select(
        F.col(query_id).alias("__qid"), F.col(vec_col).alias("__vec")
    ).repartition(queries.sparkSession.sparkContext.defaultParallelism)
    return prepared.mapInPandas(
        score, "qid long, cid long, cosine double, rank int"
    )
