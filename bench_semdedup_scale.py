#!/usr/bin/env python
"""Scale probe for the SemDeDup within-cluster prune
(operators/semdedup.py) — empirical backing for its two plan-shape
claims:

1. the self-join is cluster-bounded: with the codebook size k raised
   proportionally to corpus size n (constant expected cluster size),
   candidate-pair volume grows ~linearly in n;
2. the flat codebook argmax is the part that does NOT stay linear:
   assignment costs n·k cosines, so with k ∝ n it is quadratic in n —
   measuring where it starts to dominate tells us when a production
   deployment needs a hierarchical (coarse→fine) codebook instead of
   a flat one.

Scaled corpus: copy k of the embeddings table flips each vector's
dimensions by a deterministic Rademacher sign pattern seeded by k.
Sign-flipped copies are near-orthogonal to the originals (isotropic
base ⇒ expected cosine ~0), so the near-dup structure inside each copy
is preserved while CROSS-copy cosines stay far below threshold — the
same "copies must not be near-dups of each other" lesson bench_scale.py
learned for shingles (a naive duplicate corpus grows the true pair
count quadratically and measures the workload, not the engine).

Usage: python bench_semdedup_scale.py [--scales 1,10,30]
Writes one JSON line: {"probe": "semdedup_scale", "points": [...]}.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

COPY_OFFSET = 100_000
#: base corpus is 2000 vectors at sf0.1; keep expected cluster size at
#: BASE_N / BASE_K = 125 as n grows (the operator docstring's rule)
BASE_K = 16
THRESHOLD = 0.35


def _signs(k: int, dim: int) -> list[int]:
    """Deterministic ±1 pattern per copy (md5 parity, no RNG state)."""
    return [
        1 - 2 * (hashlib.md5(f"{k}:{i}".encode()).digest()[0] % 2)
        for i in range(dim)
    ]


def scaled_embeddings(spark: SparkSession, scale: int):
    from data_pipeline_for_real_time_retail_analytics_spark.sources import (
        load_table,
    )

    base = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    dim = len(base.select("embedding").first()[0])
    out = None
    for k in range(scale):
        c = base
        if k:
            sv = F.array(*[F.lit(float(s)) for s in _signs(k, dim)])
            c = base.select(
                (F.col("vec_id") + k * COPY_OFFSET).alias("vec_id"),
                F.zip_with(
                    "embedding", sv, lambda x, s: (x * s).cast("float")
                ).alias("embedding"),
            )
        out = c if out is None else out.unionByName(c)
    target = spark.sparkContext.defaultParallelism * 2
    return out.repartition(target, "vec_id")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,30")
    ap.add_argument(
        "--k-factor",
        type=float,
        default=1.0,
        help="multiply the occupancy-proportional codebook size k by "
        "this factor — the operator docstring's lever against "
        "correlated co-clustering concentrating near-dup pair volume "
        "(r6 probe: the 30x->90x prune segment went super-linear at "
        "k-factor 1)",
    )
    ap.add_argument(
        "--skip-flat",
        action="store_true",
        help="skip the flat n*k assignment (quadratic — prohibitive at "
        "the largest scales once the curve is established)",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench_semdedup_scale")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_pipeline_for_real_time_retail_analytics_spark.operators.hierassign import (  # noqa: E501
        assign_two_level,
        two_level_codebook,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.operators.semdedup import (  # noqa: E501
        semdedup_member,
        semdedup_prune,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.operators.similarity import (  # noqa: E501
        ivf_centroids,
    )

    points = []
    for s in scales:
        embs = scaled_embeddings(spark, s).localCheckpoint()
        n = embs.count()
        k = int(BASE_K * s * args.k_factor)
        cents = ivf_centroids(embs, n_cells=k).localCheckpoint()

        if args.skip_flat:
            assign_s = None
        else:
            t0 = time.perf_counter()
            member = semdedup_member(embs, cents).localCheckpoint()
            assign_s = round(time.perf_counter() - t0, 3)

        # the n·(k1 + k/k1) routing path, k1 = √k (hierassign docstring).
        # assign2_s times the BARE assignment identically in both modes
        # (codebook grouping + assignment, drained to a noop sink) so
        # the curve is comparable across --skip-flat runs; the member
        # join/materialization is timed separately as member_sec.
        k1 = max(2, int(round(k ** 0.5)))
        t0 = time.perf_counter()
        cb = two_level_codebook(cents, n_coarse=k1).localCheckpoint()
        assigned2 = assign_two_level(embs, cb)
        assigned2.write.format("noop").mode("overwrite").save()
        assign2_s = round(time.perf_counter() - t0, 3)
        member_s = None
        if args.skip_flat:
            # no flat member — the prune below runs over the two-level
            # member (the production composition)
            from data_pipeline_for_real_time_retail_analytics_spark.operators.semdedup import (  # noqa: E501
                semdedup_member_from_assignment,
            )

            t0 = time.perf_counter()
            member = semdedup_member_from_assignment(
                assigned2, embs
            ).localCheckpoint()
            member_s = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        kept = semdedup_prune(
            embs, cents, threshold=THRESHOLD, member=member
        )
        n_kept = kept.count()
        prune_s = round(time.perf_counter() - t0, 3)

        points.append(
            {
                "scale": s,
                "n_vectors": n,
                "k": k,
                "k_factor": args.k_factor,
                "assign_flat_sec": assign_s,
                "assign_2level_sec": assign2_s,
                "member_sec": member_s,
                "k_coarse": k1,
                "prune_sec": prune_s,
                "kept": n_kept,
                "pruned": n - n_kept,
            }
        )
        print(json.dumps(points[-1]), file=sys.stderr)

    print(json.dumps({"probe": "semdedup_scale", "points": points}))
    spark.stop()


if __name__ == "__main__":
    main()
