"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force cosine top-k against one query vector:
  the correctness baseline.  Dot products via ``zip_with``+``aggregate``
  (JVM higher-order functions, no Python); top-k is TakeOrderedAndProject.
- :func:`lsh_buckets` — sign-LSH bucketing on the first ``n_bits``
  dimensions (deterministic, engine-portable).  The scale path: a query
  probes only its own bucket, turning an O(N) scan into O(N/2^bits).
- :func:`ivf_topk` — the bucketed ("IVF-style") search using those buckets.

Floats: inputs are float32; every arithmetic step is forced to double and
results rounded, so the DuckDB oracle matches bit-for-bit.

r6 construction note: the hot expressions are built as ONE SQL string per
projection (``selectExpr``/``F.expr``) — the equivalent pyspark Column
chains cost hundreds of py4j round trips per query CONSTRUCTION (0.3-1.1 s
for the ANN queries), paid inside every timed bench rep.  The parsed
trees are identical; ``_dot``/``_norm`` keep a Column form for callers
that hold Column objects.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def adaptive_bits(n_rows: int, target_bucket: int = 32, lo: int = 4, hi: int = 16) -> int:
    """LSH bucket bits that keep the EXPECTED BUCKET SIZE constant as the
    table grows: ``ceil(log2(n/target))`` clamped to [lo, hi].

    Fixed bits are a scale cliff — the bucket self-join's output is
    Σ_b n_b² ≈ N²/2^bits, so 10× rows at constant bits is ~100× candidate
    pairs.  Holding E[bucket] ≈ target instead makes candidate volume
    O(N·target), the shape that survives a 100 TB table.  Recall per table
    drops as bits rise (p^bits); production recovers it by banding more
    tables (see :func:`multiband_neardup_pairs`), exactly like MinHash LSH's
    (rows-per-band, bands) dial.
    """
    if n_rows <= target_bucket:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n_rows / target_bucket))))


def _dot_sql(a: str, b: str) -> str:
    """SQL text of the double-forced dot product of two array columns —
    identical tree to the Column form below."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _norm_sql(a: str) -> str:
    return (
        f"sqrt(aggregate({a}, CAST(0 AS DOUBLE), "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )


def _dot(a, b):
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(a, b))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    if isinstance(a, str):
        return F.expr(_norm_sql(a))
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def with_cosine(
    df: DataFrame, query_vec_col, emb_col: str = "embedding", query_norm_col=None
) -> DataFrame:
    """``query_norm_col``: optional precomputed ||q|| column — the query
    frame is 1 row, so computing the norm there once instead of per scanned
    row saves a 64-element array pass per row; same doubles, same cos.

    When the query columns are given by NAME the whole cosine is one
    parsed SQL expression (see module note)."""
    if isinstance(query_vec_col, str):
        qn = _norm_sql(query_vec_col) if query_norm_col is None else str(query_norm_col)
        cos = (
            f"round({_dot_sql(emb_col, query_vec_col)} / ({_norm_sql(emb_col)} * {qn}), 6)"
        )
        return df.withColumn("cos", F.expr(cos))
    qn = _norm(query_vec_col) if query_norm_col is None else query_norm_col
    cos = _dot(F.col(emb_col), query_vec_col) / (_norm(F.col(emb_col)) * qn)
    return df.withColumn("cos", F.round(cos, 6))


def cosine_topk(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Brute-force top-k by cosine to the vector of ``query_vec_id``.

    The single query row is broadcast (crossJoin with a 1-row frame);
    ordering ties break on vec_id so the result is total-ordered.
    """
    q = embeddings.filter(F.col("vec_id") == query_vec_id).selectExpr(
        "embedding AS qvec", f"{_norm_sql('embedding')} AS qnorm"
    )
    scored = with_cosine(
        embeddings.filter(F.col("vec_id") != query_vec_id).crossJoin(F.broadcast(q)),
        "qvec",
        query_norm_col="qnorm",
    )
    return (
        scored.select("vec_id", "label", "cos")
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def bucket_sql(emb_col: str = "embedding", n_bits: int = 8, offset: int = 0) -> str:
    """SQL text of the sign-LSH bucket id from n_bits dimensions starting
    at ``offset`` (1-indexed element_at, identical to DuckDB list
    indexing).  Distinct offsets give independent hash tables."""
    terms = " + ".join(
        f"(CASE WHEN element_at({emb_col}, {offset + i + 1}) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_bits)
    )
    return f"CAST(({terms}) AS INT)"


def bucket_expr(emb_col: str = "embedding", n_bits: int = 8, offset: int = 0):
    """Column form of :func:`bucket_sql` (same parsed tree)."""
    return F.expr(bucket_sql(emb_col, n_bits, offset))


def lsh_buckets(embeddings: DataFrame, n_bits: int = 8) -> DataFrame:
    """Bucket histogram: (bucket, n_vecs)."""
    return (
        embeddings.selectExpr(f"{bucket_sql(n_bits=n_bits)} AS bucket")
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
    )


def bucketed_neardup_pairs(
    embeddings: DataFrame, threshold: float = 0.45, n_bits: int = 8
) -> DataFrame:
    """Composed embedding near-dup at scale: sign-LSH bucket candidates →
    cosine verify on candidates only (the embedding analog of the
    MinHash LSH→Jaccard-verify pipeline).

    The self-join is on bucket equality — a hash join whose output is
    Σ_b n_b², not N² (with b buckets of a balanced LSH that is N²/2^bits
    candidate pairs), and the cosine is computed only for candidates.  This
    is the 100 TB shape; the brute-force all-pairs query
    (queries.embedding_neardup_pairs) is the recall/verification baseline —
    same-bucket near-dups are a subset of all near-dups (LSH recall<1 by
    construction; raise n_bits tables/bands for higher recall).

    Norms are computed once per VECTOR (N rows), not twice per candidate
    PAIR — same doubles, same cos bits (guide §1.2 step 2).
    """
    e = embeddings.selectExpr(
        "vec_id", "embedding",
        f"{bucket_sql(n_bits=n_bits)} AS bucket",
        f"{_norm_sql('embedding')} AS nrm",
    )
    a = e.selectExpr("vec_id AS vec_a", "embedding AS emb_a", "nrm AS nrm_a", "bucket")
    b = e.selectExpr("vec_id AS vec_b", "embedding AS emb_b", "nrm AS nrm_b", "bucket")
    pairs = a.join(b, on="bucket").filter(F.col("vec_a") < F.col("vec_b"))
    cos_raw = f"{_dot_sql('emb_a', 'emb_b')} / (nrm_a * nrm_b)"
    return (
        pairs.withColumn("cos_raw", F.expr(cos_raw))
        .filter(F.col("cos_raw") >= threshold)
        .select("vec_a", "vec_b", "bucket", F.round("cos_raw", 6).alias("cos"))
    )


def multiband_neardup_pairs(
    embeddings: DataFrame, threshold: float = 0.45, n_bits: int = 4, n_tables: int = 3
) -> DataFrame:
    """Multi-table sign-LSH near-dup: candidates are pairs sharing a bucket
    in ANY of ``n_tables`` independent hash tables (disjoint dimension
    blocks), verified by exact cosine — the standard banding trick that
    raises recall without shrinking buckets (recall ≈ 1-(1-p^b)^T vs the
    single-table p^b).  Candidate generation stays hash joins; the union is
    deduped on the pair key BEFORE the cosine so each pair verifies once."""
    e = embeddings.select("vec_id", "embedding")
    # ONE self-join on the exploded (table, bucket) key instead of n_tables
    # scans+joins+union (guide §2.4: same candidate set — a pair shares a
    # bucket in table t iff it joins on key (t, bucket)); the union's
    # pair-dedup survives as the same distinct.  posexplode_OUTER skips the
    # inferred size>0 filter that would inline all bucket expressions a
    # second time; the array is a literal construction of n_tables >= 1
    # non-null ints, so outer ≡ inner.
    buckets = ", ".join(
        bucket_sql(n_bits=n_bits, offset=t * n_bits) for t in range(n_tables)
    )
    tb = e.selectExpr(
        "vec_id", f"posexplode_outer(array({buckets})) AS (tbl, bucket)"
    )
    a = tb.selectExpr("vec_id AS vec_a", "tbl", "bucket")
    b = tb.selectExpr("vec_id AS vec_b", "tbl", "bucket")
    cand = (
        a.join(b, on=["tbl", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    # norm once per vector (see bucketed_neardup_pairs) — bit-identical cos.
    # Both verify joins consume the SAME ev frame (columns renamed only
    # after each join), so the two build-side subtrees canonicalize equal
    # and the second is a ReusedExchange instead of a second scan+norm pass.
    ev = e.selectExpr("vec_id", "embedding", f"{_norm_sql('embedding')} AS nrm")
    ea = ev.alias("ea")
    eb = ev.alias("eb")
    j1 = cand.join(ea, F.col("vec_a") == F.col("ea.vec_id")).select(
        "vec_a", "vec_b",
        F.col("ea.embedding").alias("emb_a"), F.col("ea.nrm").alias("nrm_a"),
    )
    scored = j1.join(eb, F.col("vec_b") == F.col("eb.vec_id")).select(
        "vec_a", "vec_b", "emb_a", "nrm_a",
        F.col("eb.embedding").alias("emb_b"), F.col("eb.nrm").alias("nrm_b"),
    )
    cos_raw = f"{_dot_sql('emb_a', 'emb_b')} / (nrm_a * nrm_b)"
    return (
        scored.withColumn("cos_raw", F.expr(cos_raw))
        .filter(F.col("cos_raw") >= threshold)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cos"))
    )


def ivf_topk(embeddings: DataFrame, query_vec_id: int = 0, k: int = 5, n_bits: int = 8) -> DataFrame:
    """Bucketed ANN: search only the query's own sign-LSH bucket."""
    with_b = embeddings.withColumn("bucket", bucket_expr(n_bits=n_bits))
    q = with_b.filter(F.col("vec_id") == query_vec_id).selectExpr(
        "embedding AS qvec", "bucket AS qbucket", f"{_norm_sql('embedding')} AS qnorm"
    )
    cands = with_b.join(F.broadcast(q), on=F.col("bucket") == F.col("qbucket")).filter(
        F.col("vec_id") != query_vec_id
    )
    scored = with_cosine(cands, "qvec", query_norm_col="qnorm")
    return (
        scored.select("vec_id", "label", "bucket", "cos")
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )
