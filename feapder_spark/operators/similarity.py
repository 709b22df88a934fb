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


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def with_cosine(
    df: DataFrame, query_vec_col, emb_col: str = "embedding", query_norm_col=None
) -> DataFrame:
    """``query_norm_col``: optional precomputed ||q|| column — the query
    frame is 1 row, so computing the norm there once instead of per scanned
    row saves a 64-element array pass per row; same doubles, same cos."""
    qn = _norm(query_vec_col) if query_norm_col is None else query_norm_col
    cos = _dot(F.col(emb_col), query_vec_col) / (_norm(F.col(emb_col)) * qn)
    return df.withColumn("cos", F.round(cos, 6))


def cosine_topk(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Brute-force top-k by cosine to the vector of ``query_vec_id``.

    The single query row is broadcast (crossJoin with a 1-row frame);
    ordering ties break on vec_id so the result is total-ordered.
    """
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec"), _norm(F.col("embedding")).alias("qnorm")
    )
    scored = with_cosine(
        embeddings.filter(F.col("vec_id") != query_vec_id).crossJoin(F.broadcast(q)),
        F.col("qvec"),
        query_norm_col=F.col("qnorm"),
    )
    return (
        scored.select("vec_id", "label", "cos")
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def bucket_expr(emb_col: str = "embedding", n_bits: int = 8, offset: int = 0):
    """Sign-LSH bucket id from n_bits dimensions starting at ``offset``
    (1-indexed element_at, identical to DuckDB list indexing).  Distinct
    offsets give independent hash tables (multi-band LSH)."""
    b = F.lit(0)
    for i in range(n_bits):
        b = b + F.when(
            F.element_at(F.col(emb_col), offset + i + 1) > 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return b.cast("int")


def lsh_buckets(embeddings: DataFrame, n_bits: int = 8) -> DataFrame:
    """Bucket histogram: (bucket, n_vecs)."""
    return (
        embeddings.select(bucket_expr(n_bits=n_bits).alias("bucket"))
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
    """
    e = (
        embeddings.select("vec_id", "embedding")
        .withColumn("bucket", bucket_expr(n_bits=n_bits))
        # r6: norm once per VECTOR (N rows), not twice per candidate PAIR
        # (~N·E[bucket]/2 rows) — same doubles, same cos bits (guide §1.2
        # step 2: per-task work after the shape is right)
        .withColumn("nrm", _norm(F.col("embedding")))
    )
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"), "bucket",
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"), "bucket",
    )
    pairs = a.join(b, on="bucket").filter(F.col("vec_a") < F.col("vec_b"))
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b"))
    return (
        pairs.withColumn("cos_raw", cos)
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
    # r6: ONE self-join on the exploded (table, bucket) key instead of
    # n_tables scans+joins+union (guide §2.4: same candidate set — a pair
    # shares a bucket in table t iff it joins on key (t, bucket) — with
    # 2(n_tables-1) fewer scans and one exchange per side instead of
    # n_tables each); the union's pair-dedup survives as the same distinct.
    buckets = F.array(*[
        bucket_expr(n_bits=n_bits, offset=t * n_bits) for t in range(n_tables)
    ])
    # posexplode_OUTER: skips the inferred size>0 filter that would inline
    # all n_tables bucket expressions a second time; the array is a literal
    # construction of n_tables >= 1 non-null ints, so outer ≡ inner
    tb = e.select("vec_id", F.posexplode_outer(buckets).alias("tbl", "bucket"))
    a = tb.select(F.col("vec_id").alias("vec_a"), "tbl", "bucket")
    b = tb.select(F.col("vec_id").alias("vec_b"), "tbl", "bucket")
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
    ev = e.withColumn("nrm", _norm(F.col("embedding")))
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
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b"))
    return (
        scored.withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= threshold)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cos"))
    )


def ivf_topk(embeddings: DataFrame, query_vec_id: int = 0, k: int = 5, n_bits: int = 8) -> DataFrame:
    """Bucketed ANN: search only the query's own sign-LSH bucket."""
    with_b = embeddings.withColumn("bucket", bucket_expr(n_bits=n_bits))
    q = with_b.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec"),
        F.col("bucket").alias("qbucket"),
        _norm(F.col("embedding")).alias("qnorm"),
    )
    cands = with_b.join(F.broadcast(q), on=F.col("bucket") == F.col("qbucket")).filter(
        F.col("vec_id") != query_vec_id
    )
    scored = with_cosine(cands, F.col("qvec"), query_norm_col=F.col("qnorm"))
    return (
        scored.select("vec_id", "label", "bucket", "cos")
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )
