"""Synthesize an sf1 bench dataset (10x sf0.1) as 10 independent shards.

The sandbox testdata stops at sf0.1; the scaling question ("do the query
shapes hold at 10x rows?") needs an sf1 input with the SAME statistical
structure — in particular the dedup/near-dup group sizes must stay constant
(more groups, not 10x-bigger groups), or candidate-pair counts explode
quadratically and the bench measures a different workload.

Construction: union of 10 copies of sf0.1, each transformed so copies are
mutually dissimilar while every within-copy relationship is preserved:

- keys (orderkey/custkey/doc_id/vec_id/...) shift by a per-copy offset, with
  the SAME offset applied to both sides of every join relationship;
- document text: copy i suffixes the ~10% of vocabulary whose hash lands in
  its slot — identical substitution across a copy's docs preserves
  within-copy shingle overlap EXACTLY, while any two copies differ on ~20%
  of words, collapsing cross-copy 5-gram Jaccard to ~0.2 (below every
  near-dup threshold);
- embeddings: copy i applies a fixed random dimension permutation + sign
  flip — an orthogonal transform, so within-copy cosines are bit-preserved
  and cross-copy cosines are ~0;
- exact-dup keys (documents.source) get a per-copy suffix so md5 groups
  stay within-copy.

Usage: python scripts/make_sf1.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import hashlib
import os
import re
import sys

sys.path.insert(0, ".")

COPIES = 10


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else ".benchdata/sf1"
    os.makedirs(out, exist_ok=True)

    from pyspark.sql import functions as F

    from feapder_spark.session import get_spark

    spark = get_spark("make_sf1", master="local[16]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def t(name):
        return spark.read.parquet(f"{src}/{name}.parquet")

    def write(df, name):
        df.coalesce(8).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: {df.count()} rows")

    # tiny dims pass through (joins reference them unshifted)
    for name in ("region", "nation"):
        write(t(name), name)

    def shards(df, shifts: dict[str, int]):
        parts = []
        for i in range(COPIES):
            c = df
            for col, unit in shifts.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * unit))
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    write(shards(t("customer"), {"c_custkey": 10**6}), "customer")
    write(shards(t("supplier"), {"s_suppkey": 10**5}), "supplier")
    write(shards(t("part"), {"p_partkey": 10**6}), "part")
    write(shards(t("orders"), {"o_orderkey": 10**7, "o_custkey": 10**6}), "orders")
    write(
        shards(
            t("lineitem"),
            {"l_orderkey": 10**7, "l_partkey": 10**6, "l_suppkey": 10**5},
        ),
        "lineitem",
    )
    write(shards(t("events"), {"event_id": 10**7, "user_id": 10**7}), "events")

    # documents: per-copy vocabulary substitution (see module docstring)
    import pandas as pd

    def doc_shards(it):
        word_re = re.compile(r"\w+")
        for pdf in it:
            out_frames = []
            for i in range(COPIES):

                def sub(m, i=i):
                    w = m.group(0)
                    h = int(hashlib.md5(w.lower().encode()).hexdigest()[:8], 16)
                    return w + f"x{i}" if (h % COPIES) == i and i > 0 else w

                texts = [word_re.sub(sub, s) for s in pdf["text"]]
                out_frames.append(
                    pd.DataFrame(
                        {
                            "doc_id": pdf["doc_id"] + i * 10**6,
                            "text": texts,
                            "lang": pdf["lang"],
                            "source": [
                                s if i == 0 else f"{s}#c{i}" for s in pdf["source"]
                            ],
                            "n_chars": [len(s) for s in texts],
                        }
                    )
                )
            yield pd.concat(out_frames, ignore_index=True)

    docs = t("documents")
    write(
        docs.repartition(16).mapInPandas(
            doc_shards, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
        ),
        "documents",
    )

    # embeddings: per-copy orthogonal transform (permutation + sign flips)
    def emb_shards(it):
        import numpy as np

        for pdf in it:
            out_frames = []
            dim = len(pdf["embedding"].iloc[0])
            for i in range(COPIES):
                if i == 0:
                    vecs = list(pdf["embedding"])
                else:
                    rng = np.random.RandomState(1000 + i)
                    perm = rng.permutation(dim)
                    signs = rng.choice([-1.0, 1.0], size=dim).astype("float32")
                    mat = np.array([np.asarray(v, dtype="float32") for v in pdf["embedding"]])
                    tr = mat[:, perm] * signs
                    vecs = [row for row in tr]
                out_frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"] + i * 10**6,
                            "embedding": vecs,
                            "label": pdf["label"],
                        }
                    )
                )
            yield pd.concat(out_frames, ignore_index=True)

    write(
        t("embeddings").repartition(8).mapInPandas(
            emb_shards, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
        ),
        "embeddings",
    )
    print("sf1 written to", out)


if __name__ == "__main__":
    main()
