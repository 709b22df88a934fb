"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Scale-first shapes (r6 optimization pass — guide §2.4 "remove shuffles
outright" and §4.1 "built-ins / higher-order functions"):

- **MinHash**: signatures are computed PER DOCUMENT with array higher-order
  functions (``transform`` + ``array_min``) — zero explode, zero shuffle;
  the old shape exploded shingles × seeds (19.2M rows at sf1) through a
  hash aggregate.  Hashes are md5-hex *strings* ordered lexically —
  portable bit-for-bit to the DuckDB oracle (min over hex strings).
- **LSH bands**: band hashes are likewise per-doc array slices
  (min/max of exactly ``rows_per_band`` signature entries); only the tiny
  (doc_id, band, band_hash) rows ever reach the candidate self-join.
- **SimHash**: 16-bit portable variant via one md5 per token
  (``transform``) + 16 array ``aggregate`` passes — again no explode, no
  groupBy shuffle; per-bit weight = parity of the corresponding md5 hex
  char (identical in any engine with ascii+md5).
- **n-gram Jaccard**: exact verification for candidate pairs — the corpus
  is first PRUNED to documents that appear in a candidate pair (broadcast
  semi-join, guide §3.2/§8), each doc's shingle SET stays an array
  (``array_distinct``), and the pair intersection is a per-pair
  ``size(array_intersect)`` — no shingle rows are ever exploded into the
  joins.

All JVM-side SQL expressions — no Python UDFs anywhere; the hot
projections are built as single ``selectExpr`` strings because the
equivalent Column-call chains cost hundreds of py4j round trips per
query construction (see _tok_df).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKENIZE = r"\s+"


def _tok_df(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """(doc_id, toks) with docs of < n tokens dropped.  Built via ONE
    selectExpr SQL string: constructing the same tree from pyspask Column
    calls costs hundreds of py4j round trips PER QUERY CONSTRUCTION
    (measured 0.2-0.5 s per headline query, paid inside every timed bench
    rep); a single parsed string is one round trip with an identical
    analyzed plan."""
    d = df.selectExpr("doc_id", f"split(lower(trim({text_col})), '\\\\s+') AS toks")
    return d.filter(F.expr(f"size(toks) >= {n}"))



def _shingle_array(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingles array<string>) word n-grams; docs with < n tokens
    drop out.  The array form feeds the per-doc signature/band computation;
    :func:`word_shingles` explodes it for set-style consumers.

    Expression-shape note (the r6 lesson): every lambda below touches only
    ATTRIBUTES of the previous projection, never a rebuilt ``split(...)``
    expression — when Catalyst inlines a projection into a lambda body,
    interpreted higher-order functions re-evaluate it PER ELEMENT, turning
    tokenization O(tokens) into O(tokens²) per doc."""
    d = _tok_df(df, text_col, n)
    parts = ", ".join(f"element_at(toks, i + {j + 1})" for j in range(n))
    sh = f"transform(sequence(0, size(toks) - {n}), i -> concat_ws(' ', {parts}))"
    return d.selectExpr("doc_id", f"{sh} AS shingles")


def word_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) word n-grams; docs with < n tokens drop out.

    Explodes the OFFSET sequence, not a prebuilt shingle array: a
    ``Generate`` over an array column gets an inferred ``size(arr) > 0``
    filter pushed below the projection with the whole array expression
    inlined — per-element re-tokenization (see _shingle_array note).  The
    offset explode's inferred filter only re-evaluates ``split`` once per
    row; the shingle itself is assembled per OUTPUT row from the ``toks``
    attribute."""
    d = _tok_df(df, text_col, n).selectExpr(
        "doc_id", "toks", f"explode_outer(sequence(0, size(toks) - {n})) AS i"
    )
    parts = ", ".join(f"element_at(toks, i + {j + 1})" for j in range(n))
    return d.selectExpr("doc_id", f"concat_ws(' ', {parts}) AS shingle")


def signature_array(
    df: DataFrame, n_hashes: int = 8, text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, sigs array<string>[n_hashes]): sigs[s] = min over shingles
    of md5(s || ':' || shingle).  Pure per-row map — no explode, no shuffle
    (guide §2.4): the plan is Scan → Project inside one WholeStageCodegen.
    """
    sh = _shingle_array(df, text_col, n)
    mins = ", ".join(
        f"array_min(transform(shingles, x -> md5(concat('{s}:', x))))"
        for s in range(n_hashes)
    )
    return sh.selectExpr("doc_id", f"array({mins}) AS sigs")


def minhash_signatures(
    df: DataFrame, n_hashes: int = 8, text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, seed, minhash): minhash = min(md5(seed || ':' || shingle)).

    Same rows as the historical explode+groupBy shape, but derived from the
    per-doc :func:`signature_array`.  The generator explodes a LITERAL seed
    sequence (its inferred non-empty filter constant-folds away) and picks
    ``sigs[seed]`` from the attribute per output row — never explode the
    sigs array itself (see word_shingles note).
    """
    arr = signature_array(df, n_hashes, text_col, n)
    d = arr.selectExpr(
        "doc_id", "sigs", f"explode(sequence(0, {n_hashes - 1})) AS seed"
    )
    return d.selectExpr("doc_id", "seed", "element_at(sigs, seed + 1) AS minhash")


def band_hashes(
    signatures_arr: DataFrame, rows_per_band: int = 2, n_hashes: int = 8
) -> DataFrame:
    """(doc_id, band, band_hash) from the array-form signatures.

    Band hash = md5(min||','||max) over the band's ``rows_per_band``
    minhashes — computed per doc from array slices (no groupBy), identical
    to the historical groupBy(doc_id, band) min/max.
    """
    n_bands = (n_hashes + rows_per_band - 1) // rows_per_band
    d = signatures_arr.selectExpr(
        "doc_id", "sigs", f"explode(sequence(0, {n_bands - 1})) AS band"
    )
    sl = f"slice(sigs, band * {rows_per_band} + 1, {rows_per_band})"
    return d.selectExpr(
        "doc_id",
        "band",
        f"md5(concat_ws(',', array_min({sl}), array_max({sl}))) AS band_hash",
    )


def band_candidates(
    signatures: DataFrame, rows_per_band: int = 2, n_hashes: int = 8
) -> DataFrame:
    """LSH banding: docs sharing any band hash become candidate pairs.

    Accepts either the array-form signatures (doc_id, sigs) or the exploded
    row form (doc_id, seed, minhash); only the tiny (doc_id, band,
    band_hash) rows reach the self-join.  Output: (doc_a, doc_b) distinct,
    doc_a < doc_b.
    """
    if "sigs" in signatures.columns:
        bands = band_hashes(signatures, rows_per_band, n_hashes)
    else:  # historical row form
        bands = (
            signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
            .groupBy("doc_id", "band")
            .agg(F.md5(F.concat_ws(",", F.min("minhash"), F.max("minhash"))).alias("band_hash"))
        )
    a = bands.alias("a")
    b = bands.alias("b")
    # shuffle_hash hint: with BOTH sides shuffled on (band, band_hash) the
    # two identical subtrees collapse into one Exchange + ReusedExchange —
    # the signature pipeline is computed ONCE; a broadcast here would build
    # and probe two separate copies (and would be the wrong shape for a
    # web-scale bands table anyway)
    return (
        a.hint("shuffle_hash").join(b, on=["band", "band_hash"], how="inner")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash16(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Portable 16-bit SimHash: bit b set iff sum over tokens of
    (±1 by parity of md5-hex char b) is positive.

    One md5 per token (``transform``) + 16 cheap array ``aggregate``
    passes per doc — no explode, no groupBy shuffle (guide §2.4); the
    whole expression is ONE parsed SQL string (see _tok_df note)."""
    d = df.selectExpr(
        "doc_id",
        f"transform(split(lower(trim({text_col})), '\\\\s+'), t -> md5(t)) AS hs",
    )

    def bit_sum(b: int) -> str:
        return (
            "aggregate(hs, 0, (acc, h) -> acc + (CASE WHEN "
            f"ascii(substring(h, {b + 1}, 1)) % 2 = 1 THEN 1 ELSE -1 END))"
        )

    sim = " + ".join(
        f"(CASE WHEN {bit_sum(b)} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16)
    )
    return d.selectExpr("doc_id", f"({sim}) AS simhash")


def ngram_jaccard_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str = "text", n: int = 3,
    min_jaccard: float | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard for candidate pairs (verification stage).

    ``pairs``: (doc_a, doc_b).  Returns (doc_a, doc_b, jaccard) with
    jaccard rounded to 4 decimals; ``min_jaccard`` filters on the *raw*
    ratio (before rounding) so thresholds match SQL oracles exactly.

    The corpus is pruned to documents appearing in a candidate pair first
    (broadcast semi-join — guide §3.2: drop definitely-non-matching rows
    before the shuffle), so the intersection join runs over candidate docs
    only.  Candidates are assumed << corpus (they are the LSH output); at a
    scale where candidate-doc ids outgrow a broadcast, swap the hint for a
    Bloom filter over the same ids.

    The shingle SET per doc stays an ARRAY end to end: ``array_distinct``
    on the per-doc shingle array (a row-local op) replaces the corpus-wide
    ``distinct()`` shuffle, and the pair intersection is a per-pair
    ``array_intersect`` size instead of exploding shingle rows through two
    joins and a re-aggregation — the only shuffles left are the tiny pair
    and doc-id joins (guide §2.3: shuffle keys and metadata, never blow a
    row set up just to count it back down).
    """
    # (A lazy localCheckpoint of `pairs` was tried here to stop the
    # broadcast prune from re-running the LSH pipeline, and looked good in
    # a sequential probe — but an INTERLEAVED same-session A/B shows it
    # consistently ~0.6 s SLOWER at sf1 (best 4.32 vs 3.71): AQE stage
    # reuse already shares the candidate exchange across both consumers,
    # so the .rdd conversion + block writes are pure overhead.  Kept out.)
    cand_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    pruned = df.join(F.broadcast(cand_docs), on="doc_id", how="left_semi")
    sharr = _shingle_array(pruned, text_col, n).select(
        "doc_id", F.array_distinct("shingles").alias("shd")
    )
    sharr = sharr.select("doc_id", "shd", F.size("shd").alias("sz"))
    # every doc referenced by a pair has >= 1 shingle (it produced a
    # signature), so these inner joins keep every pair — including
    # zero-intersection ones (n_inter = 0), preserving the min_jaccard=None
    # contract without a separate left join.  Both joins consume the SAME
    # sharr frame (renames only after each join) so the two shingle-side
    # subtrees canonicalize equal → the second is a ReusedExchange, and the
    # pruned corpus is shingled once.
    sa = sharr.alias("sa")
    sb = sharr.alias("sb")
    j1 = pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id")).select(
        "doc_a", "doc_b", F.col("sa.shd").alias("shd_a"), F.col("sa.sz").alias("sz_a")
    )
    joined = (
        j1.join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect(F.col("shd_a"), F.col("sb.shd"))).alias("n_inter"),
            "sz_a", F.col("sb.sz").alias("sz_b"),
        )
    )
    # aggregation barrier: (doc_a, doc_b) rows are already unique, so this
    # is a no-op on values — but without it PushPredicateThroughJoin folds
    # the min_jaccard filter (with array_intersect inlined) into the hash
    # join's residual condition, which measured ~30x slower than the same
    # predicate as a post-join filter (97 s vs 3 s at sf1)
    scored = joined.groupBy("doc_a", "doc_b").agg(
        F.min("n_inter").alias("n_inter"),
        F.min("sz_a").alias("sz_a"),
        F.min("sz_b").alias("sz_b"),
    )
    raw = F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
    if min_jaccard is not None:
        scored = scored.filter(raw >= min_jaccard)
    return scored.select("doc_a", "doc_b", F.round(raw, 4).alias("jaccard"))
