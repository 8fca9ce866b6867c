"""Dedup-heavy curation job for the N-vs-4N scaling harness.

The extraction scaling series (run_scaling.py + job.py) measures the
map-heavy path: one wide exchange, Arrow kernels, bucketed write.  The
north rule's efficiency claim must also hold on the SHUFFLE-BOUND
stages — MinHash banding, candidate equi-joins, connected components —
whose scaling behavior is qualitatively different (exchange- and
barrier-dominated, skew-sensitive).  This job runs the curate_corpus
composition's dedup spine over the same cached synthetic pages corpus:

    extract (Arrow kernel) -> quality filter -> CCNet line dedup ->
    MinHash-LSH near-dup clusters (xxhash64 production hash family) ->
    keep canonical -> one summarizing aggregate

and prints the same one-line stats JSON as job.py (wall_s from the
first Spark action, session startup excluded), so run_scaling.py can
drive it unchanged via --job-script:

    python BENCH/run_scaling.py --job-script BENCH/curate_job.py \
        --out-json scaling_curate.json --no-md --low 2 --high 8 [...]

The final aggregate (not a full write) is deliberate: the write path's
scaling is already measured by the extraction series; adding output
I/O here would blur the shuffle measurement with sink throughput.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="dedup/curation scaling job")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", default="/tmp/ocr_spark_curate_out")
    ap.add_argument("--run-id", default="curate0")
    ap.add_argument("--buckets", type=int, default=64)   # CLI parity
    ap.add_argument("--cores", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ocr_spark.functions.quality import with_quality_filter
    from ocr_spark.operators.dedup import line_dedup, near_dup_clusters
    from ocr_spark.operators.extract import extract_pages
    from ocr_spark.session import get_spark

    spark = get_spark("ocr_spark_curate", cores=args.cores or None)
    pages = spark.read.parquet(args.input).select("url", "html")

    phases: dict[str, float] = {}
    t0 = time.perf_counter()
    # Size the extract stage by COMPUTE, not by scan splits: a 436 MB
    # corpus yields ~4 file splits at the default maxPartitionBytes, so
    # without this exchange local[8] runs the Arrow kernel on half-idle
    # cores (measured: extract phase scaled 0.65 instead of ~0.9).
    # Same rule as the pipeline's one wide html exchange
    # (plans/pipeline.py: explicit numPartitions so AQE's size-based
    # coalescing cannot serialize the compute-bound extract stage).
    pages = pages.repartition(spark.sparkContext.defaultParallelism * 2)
    ext = extract_pages(pages, payload_col="html", passthrough=("url",),
                        with_spans=False)
    # MATERIALIZE the extracted+filtered corpus before fan-out: qual
    # feeds line_dedup's banned-line aggregate, its re-filter pass, and
    # the bytes join — without a barrier Spark re-runs the Arrow
    # extract kernel once per consumer (measured 3x the extract cost
    # in one action).  A production run persists to storage here.
    qual = (with_quality_filter(ext)
            .filter(F.col("keep") == 1)
            .select("url", "text", "bytes_in")
            .localCheckpoint())
    phases["extract_quality_s"] = round(time.perf_counter() - t0, 1)
    t1 = time.perf_counter()
    ld = line_dedup(qual, "url", "text", min_dup_docs=2, min_line_chars=10)
    # the curated corpus feeds the LSH pair generator AND the node list
    # AND the canonical join — same single materialization barrier as
    # q_curate_corpus (212 exchanges without it).  Repartition by
    # compute BEFORE checkpointing: the join output is post-shuffle, so
    # AQE's size-based coalescing packs ~56 MB of text into 1-2
    # partitions and every downstream stage (MinHash signatures — the
    # cluster phase's real work) runs near-single-threaded REGARDLESS
    # of cores (measured: cluster phase scaled 0.51, data-proportional
    # and cores-independent).  Size-based coalescing is right for
    # byte-bound stages and wrong for compute-bound ones — the same
    # principle as the pipeline's explicit-numPartitions html exchange.
    par = spark.sparkContext.defaultParallelism * 2
    corpus = (ld.select("url", "text")
              .join(qual.select("url", "bytes_in"), "url")
              .repartition(par)
              .localCheckpoint())
    phases["line_dedup_s"] = round(time.perf_counter() - t1, 1)
    t2 = time.perf_counter()
    clusters = near_dup_clusters(corpus, "url", "text", n_hashes=16,
                                 bands=8, shingle_k=3,
                                 hash_mode="xxhash64")
    kept = corpus.join(
        clusters.filter(F.col("url") == F.col("cluster_id")).select("url"),
        "url")
    row = kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.length("text")).alias("chars_kept"),
        F.sum("bytes_in").alias("bytes_in_kept"),
    ).collect()[0]
    phases["cluster_keep_s"] = round(time.perf_counter() - t2, 1)
    n_in = corpus.count()
    bytes_in = corpus.agg(F.sum("bytes_in")).collect()[0][0] or 0
    wall = time.perf_counter() - t0

    stats = {
        "run_id": args.run_id,
        "wall_s": wall,
        "n_docs": int(n_in),
        "n_kept": int(row["n_kept"]),
        "chars_kept": int(row["chars_kept"] or 0),
        "bytes_in": int(bytes_in),
        "docs_per_s": (n_in / wall) if wall else 0.0,
        "gb_per_s": (bytes_in / 1e9 / wall) if wall else 0.0,
        "n_ok": int(row["n_kept"]),
        "n_err": 0,
        "phases": dict(phases, curate_s=round(wall, 3)),
    }
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
