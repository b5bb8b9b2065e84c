"""r14 probe: where does the per-iteration cost of kmeans_centroids go?

Splits one Lloyd iteration into its driver-side phases:
  (a) createDataFrame of the 1-row centroid local relation (+ with_nrm)
  (b) building the asg/mean DataFrame (py4j expression construction)
  (c) Catalyst ANALYSIS (forced via .schema / queryExecution analysis)
  (d) execution (the collect itself: optimize + plan + run)

and times warm 3-iteration trains before/after any change.

Usage: python tools/r14_kmeans_probe.py [sf_dir] [--scale]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_20_spark import get_spark  # noqa: E402
from hadoop_20_spark.catalog import load_table  # noqa: E402
from hadoop_20_spark.operators import similarity as sim  # noqa: E402


def phase_probe(spark, corpus, k=16, dim=64):
    """One manual Lloyd iteration, phase-timed (mirrors kmeans_centroids)."""
    from hadoop_20_spark.functions import ensure_parallelism, let as _let
    from hadoop_20_spark.operators.similarity import dot, norm

    c = ensure_parallelism(corpus).select(
        F.col("vec_id").alias("_vid"), F.col("embedding").alias("_vec")
    ).localCheckpoint()
    model = {
        r["cent_id"]: list(r["c_vec"])
        for r in corpus.filter(F.col("vec_id") < k)
        .select(
            F.col("vec_id").cast("long").alias("cent_id"),
            F.col("embedding").cast("array<double>").alias("c_vec"),
        )
        .collect()
    }
    arr_schema = "_cents array<struct<cent_id:bigint,c_vec:array<double>>>"
    with_nrm = F.transform(
        F.col("_cents"),
        lambda g: F.struct(
            g["cent_id"].alias("cent_id"),
            g["c_vec"].alias("c_vec"),
            norm(g["c_vec"]).alias("c_nrm"),
        ),
    ).alias("_cents")
    argmax_cell = _let(
        norm(F.col("_vec")),
        lambda nv: F.array_max(
            F.transform(
                F.col("_cents"),
                lambda g: F.struct(
                    F.round(
                        dot(F.col("_vec"), g["c_vec"]) / (nv * g["c_nrm"]), 4
                    ).alias("sim"),
                    (-g["cent_id"]).alias("_neg"),
                    g["cent_id"].alias("cid"),
                ),
            )
        )["cid"],
    ).alias("cell")

    for it in range(4):
        t0 = time.time()
        cent_arr = spark.createDataFrame(
            [([(cid, model[cid]) for cid in sorted(model)],)], arr_schema
        ).select(with_nrm)
        t1 = time.time()
        asg = c.crossJoin(F.broadcast(cent_arr)).select("_vid", "_vec", argmax_cell)
        mean_df = (
            asg.select("cell", F.posexplode("_vec").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(
                F.round(
                    F.sum(F.col("val").cast("double").cast("decimal(30,10)"))
                    .cast("double")
                    / F.count("val"),
                    8,
                ).alias("m")
            )
        )
        t2 = time.time()
        # force analysis only
        mean_df._jdf.queryExecution().analyzed()
        t3 = time.time()
        rows = mean_df.collect()
        t4 = time.time()
        print(
            f"iter {it}: createDF={t1-t0:.3f}s build={t2-t1:.3f}s "
            f"analyze={t3-t2:.3f}s execute={t4-t3:.3f}s total={t4-t0:.3f}s "
            f"({len(rows)} cells)"
        )


def train_probe(spark, corpus, k, iterations, mod, reps=3):
    for r in range(reps):
        t0 = time.time()
        m = sim.kmeans_centroids(
            corpus, k=k, iterations=iterations, train_sample_mod=mod
        )
        m.count()
        print(f"train rep {r}: {time.time()-t0:.2f}s")
    import hashlib

    rows = m.orderBy("cent_id").collect()
    h = hashlib.md5(repr([(x["cent_id"], x["c_vec"]) for x in rows]).encode())
    print("model md5:", h.hexdigest())


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.1"
    spark = get_spark()
    emb = load_table(spark, "embeddings", sf_dir)
    n = emb.count()
    print(f"embeddings n={n}")
    if "--scale" in sys.argv:
        # corpus-scaled-k regime: 200k deterministic vectors, k=1024 —
        # A/B the exact-numpy Lloyd assignment kernel vs the expression
        # argmax, asserting md5-identical models (r14)
        import hashlib

        df = spark.range(200_000).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: (
                    (F.conv(F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit("_"), i.cast("string"))), 1, 15), 16, 10).cast("double") / 1.15292150460685e18)
                    - 0.5
                ),
            ).alias("embedding"),
        ).localCheckpoint()
        print("scale corpus ready", df.count())

        def md5_model(m):
            rows = m.orderBy("cent_id").collect()
            return hashlib.md5(
                repr([(r["cent_id"], list(r["c_vec"])) for r in rows]).encode()
            ).hexdigest()

        for rep in range(2):
            t0 = time.time()
            m1 = sim.kmeans_centroids(df, k=1024, iterations=2, train_sample_mod=2)
            m1.count()
            print(f"kernel rep {rep}: {time.time()-t0:.1f}s path={sim.LAST_TRAIN_PATH}")
        h1 = md5_model(m1)
        sim.KMEANS_ASSIGN_KERNEL = False
        try:
            t0 = time.time()
            m2 = sim.kmeans_centroids(df, k=1024, iterations=2, train_sample_mod=2)
            m2.count()
            print(f"expr: {time.time()-t0:.1f}s path={sim.LAST_TRAIN_PATH}")
            h2 = md5_model(m2)
        finally:
            sim.KMEANS_ASSIGN_KERNEL = True
        print("md5 equal:", h1 == h2, h1)
    else:
        print("== phase probe (k=16, warm loop) ==")
        phase_probe(spark, emb)
        print("== full train probe (k=16, iters=3, mod=1) ==")
        train_probe(spark, emb, k=16, iterations=3, mod=1)
    spark.stop()


if __name__ == "__main__":
    main()
