"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Scale-first shapes:

- **MinHash** (shingle → minhash → band → bucket-join): signatures are one
  explode + groupBy (shuffle keyed on (doc_id, seed) — tiny rows); band
  buckets hash-join docs sharing a band, so candidate generation never
  compares all pairs.  Hashes are md5-hex *strings* ordered lexically —
  portable bit-for-bit to the DuckDB oracle (min over hex strings).
- **SimHash**: 16-bit portable variant; per-bit weight = parity of the
  corresponding md5 hex char (identical in any engine with ascii+md5).
- **n-gram Jaccard**: exact verification for candidate pairs — token-set
  join + intersection/union counts; meant to run on the (small) candidate
  set, not the corpus cross-product.

All pure pyspark.sql.functions — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKENIZE = r"\s+"


def word_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) word n-grams; docs with < n tokens drop out."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), TOKENIZE)
    d = df.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= n)
    idx = F.sequence(F.lit(0), F.size("toks") - n)
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at("toks", i + j + 1) for j in range(n)])
    )
    return d.select("doc_id", F.explode(shingles).alias("shingle"))


def minhash_signatures(df: DataFrame, n_hashes: int = 8, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, seed, minhash): minhash = min(md5(seed || ':' || shingle)).

    md5-hex strings compare lexically the same everywhere, making the
    signature engine-portable without integer hash agreement.
    """
    sh = word_shingles(df, text_col, n)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    seeded = sh.select("doc_id", "shingle", seeds)
    return (
        seeded.withColumn("h", F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("shingle"))))
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def band_candidates(signatures: DataFrame, rows_per_band: int = 2) -> DataFrame:
    """LSH banding: docs sharing any band hash become candidate pairs.

    With 8 hashes and 2 rows/band → 4 bands.  Band hash = md5(min||','||max)
    of the band's (exactly two) minhashes — deterministic without collect_list
    ordering.  Output: (doc_a, doc_b) distinct, doc_a < doc_b.
    """
    bands = (
        signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws(",", F.min("minhash"), F.max("minhash"))).alias("band_hash"))
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, on=["band", "band_hash"], how="inner")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash16(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Portable 16-bit SimHash: bit b set iff sum over tokens of
    (±1 by parity of md5-hex char b) is positive."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), TOKENIZE)
    tok = df.select("doc_id", F.explode(toks).alias("tok")).withColumn("h", F.md5("tok"))
    per_bit = [
        F.sum(
            F.when(F.ascii(F.substring("h", b + 1, 1)) % 2 == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"s{b}")
        for b in range(16)
    ]
    agg = tok.groupBy("doc_id").agg(*per_bit)
    sim = None
    for b in range(16):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str = "text", n: int = 3,
    min_jaccard: float | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard for candidate pairs (verification stage).

    ``pairs``: (doc_a, doc_b).  Returns (doc_a, doc_b, jaccard) with
    jaccard rounded to 4 decimals; ``min_jaccard`` filters on the *raw*
    ratio (before rounding) so thresholds match SQL oracles exactly.
    """
    sh = word_shingles(df, text_col, n).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a"), on="doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b"), on=["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    scored = (
        pairs.join(inter, on=["doc_a", "doc_b"], how="left")
        .fillna(0, subset=["n_inter"])
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), on="doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), on="doc_b")
    )
    raw = F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
    if min_jaccard is not None:
        scored = scored.filter(raw >= min_jaccard)
    return scored.select("doc_a", "doc_b", F.round(raw, 4).alias("jaccard"))
