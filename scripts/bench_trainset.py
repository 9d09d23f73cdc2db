"""Two-parallelism scaling evidence for the FULL WARC-to-trainset pipeline
(the warc_trainset_e2e capstone): record walk + status/type filter +
noindex gate + main-text kernel + token gate + exact-dedup window, at N
and 4N cores over one materialized segment store. Unlike bench_warc.py
(pure shuffle-free kernel), this job includes the pipeline's one real
shuffle — the dedup window on fingerprints — so it is the representative
end-to-end scaling number for the ingest-to-corpus path.

    python scripts/bench_trainset.py [n_docs] [n_low]

Writes BENCH/scaling_trainset_{n_low}v{4*n_low}.json. Interleaved
min-per-level, same methodology + caveats as bench_scaling.py (shared-box
contention makes the reported efficiency a LOWER bound on cluster
scaling).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark

ROUNDS = int(os.environ.get("SCALING_ROUNDS", "3"))

# ~300-char unique bodies (the dedup window shuffles every fingerprint —
# the worst case for the pipeline's one exchange).
_DOCS_SQL = """
SELECT id AS doc_id,
       repeat('lorem ipsum dolor sit amet consectetur ', 8)
         || CAST(id AS STRING) AS text
FROM range(0, {n})
"""


def _pipeline(spark, store_path: str):
    from pyspark.sql import functions as F

    from frontier.pages import extract_main_text, noindex_flags
    from frontier.warc import warc_records

    segments = spark.read.parquet(store_path)
    recs = warc_records(segments, responses_only=True).filter(
        (F.col("http_status") == 200) & (F.col("content_type") == "text/html")
    )
    recs = noindex_flags(recs, x_robots_col="x_robots").filter(
        ~F.col("noindex")
    )
    main = extract_main_text(recs).select("url", "main_text")
    words = F.filter(
        F.split(F.lower("main_text"), "[^a-z0-9]+"), lambda x: x != ""
    )
    scored = main.select(
        "url",
        F.size(words).cast("long").alias("n_tokens"),
        F.md5("main_text").alias("fp"),
    ).filter(F.col("n_tokens") >= 5)
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy("url")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def run_level_once(cpus: int, store_path: str) -> dict:
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:

        def job() -> None:
            _pipeline(spark, store_path).write.format("noop").mode(
                "overwrite"
            ).save()

        job()  # untimed warm-up (Python worker pool, JIT, page cache)
        samples = []
        for _ in range(2):
            os.sync()
            start = time.perf_counter()
            job()
            samples.append(time.perf_counter() - start)
        return {"cpus": cpus, "seconds": min(samples), "samples": samples}
    finally:
        spark.stop()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = 4 * n_low

    import bench as _bench

    workdir = os.path.join(
        _bench.SCRATCH or "/tmp", f"frontier_trainset_{os.getpid()}"
    )
    store_path = os.path.join(workdir, "segments")

    from frontier.synth import synth_warc_segments

    spark = build_spark(n_high)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.sql(_DOCS_SQL.format(n=n_docs)).repartition(8 * n_high)
    synth_warc_segments(docs).write.mode("overwrite").parquet(store_path)
    n_out = _pipeline(spark, store_path).count()
    n_bytes = (
        spark.read.parquet(store_path)
        .selectExpr("CAST(sum(length(payload)) AS BIGINT)")
        .first()[0]
    )
    spark.stop()
    print(
        f"store: {n_docs} docs -> {n_out} surviving corpus rows, "
        f"{n_bytes/1e9:.2f} GB payload",
        file=sys.stderr,
    )

    best: dict[int, dict] = {}
    samples: dict[int, list[float]] = {n_low: [], n_high: []}
    try:
        for rnd in range(ROUNDS):
            for cpus in (n_low, n_high):
                r = run_level_once(cpus, store_path)
                samples[cpus].extend(round(s, 2) for s in r["samples"])
                print(
                    f"round {rnd} local[{cpus}]: {r['seconds']:.2f}s "
                    f"(samples {r['samples']})",
                    file=sys.stderr,
                )
                if cpus not in best or r["seconds"] < best[cpus]["seconds"]:
                    best[cpus] = r
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    low, high = best[n_low], best[n_high]
    for r in (low, high):
        r["seconds"] = round(r["seconds"], 2)
        r["docs_per_sec"] = round(n_docs / r["seconds"], 1)
        r["mb_per_sec"] = round(n_bytes / 1e6 / r["seconds"], 1)

    eff = (high["docs_per_sec"] / low["docs_per_sec"]) / (n_high / n_low)
    result = {
        "n_docs": n_docs,
        "n_corpus_rows": n_out,
        "payload_bytes": n_bytes,
        "low": low,
        "high": high,
        "scaling_efficiency": round(eff, 3),
        "all_samples_sec": samples,
    }
    print(json.dumps(result))

    os.makedirs("BENCH", exist_ok=True)
    with open(f"BENCH/scaling_trainset_{n_low}v{n_high}.json", "w") as fh:
        json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
