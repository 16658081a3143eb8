"""Benchmark harness (driver contract: prints ONE JSON line).

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]:

- `extract_flagship`: the north-star path — render every documents row
  into a boilerplated page and run the full extraction + dedup +
  validation + quality pipeline (count() forces the whole plan). Also
  reported as docs/sec.
- `extract_corpus`: the same pipeline over the richer synthetic corpus
  (PDF branch, charset variants, skewed hosts, re-crawl dups) at
  $SPARK_GRAFT_BENCH_DOCS (default 20000) generated docs — the
  throughput number the scaling check uses.
- a relational/window/near-dup sample from the query registry.

Modes:
    python bench.py                 # one JSON line (driver contract)
    python bench.py --scaling       # run extract_corpus at local[8] and
                                    # local[32] in fresh JVMs, print
                                    # throughput@8, @32, efficiency
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "region_revenue",
    "window_running",
    "dedup_latest_events",
    "minhash_signatures",
    "simhash",
    "embedding_topk",
    "extract_roundtrip",
]


def run_once(sf_dir: str, cores: int) -> dict:
    from ocr_service_spark.entry_pipeline import htmlified_documents
    from ocr_service_spark.pipeline import process_documents
    from ocr_service_spark.queries import QUERIES
    from ocr_service_spark.session import build_session

    spark = build_session("bench", cores=cores, shuffle_partitions=max(cores, 8))
    timings: dict[str, float] = {}

    # warm the JVM/codegen so per-query numbers measure the plan, not startup
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def best_of(fn, reps: int = 2):
        # the sandbox host has periodic external contention bursts
        # (load spikes with no local process) — min-of-2 measures the
        # plan, not the neighbours
        best, n = None, 0
        for _ in range(reps):
            t0 = time.time()
            n = fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return best, n

    flagship_s, n_docs = best_of(
        lambda: process_documents(htmlified_documents(spark, sf_dir)).count())
    timings["extract_flagship"] = round(flagship_s, 3)

    n_corpus = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
    from ocr_service_spark.corpus import corpus_df

    corpus_s, n_c = best_of(
        lambda: process_documents(corpus_df(spark, n_corpus, partitions=cores * 4)).count())
    timings["extract_corpus"] = round(corpus_s, 3)

    for name in HEADLINE:
        dt, _ = best_of(lambda: QUERIES[name](spark, sf_dir).count())
        timings[name] = round(dt, 3)

    spark.stop()
    return {
        "timings": timings,
        "flagship_docs": n_docs,
        "flagship_docs_per_sec": round(n_docs / flagship_s, 1),
        "corpus_docs": n_corpus,
        "corpus_rows_out": n_c,
        "corpus_docs_per_sec": round(n_corpus / corpus_s, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    if "--scaling-child" in sys.argv:
        # One fresh-JVM extraction run at $SPARK_GRAFT_CPUS over a
        # MATERIALIZED corpus parquet (written once, untimed): the
        # north metric is docs/sec extraction over a stored table, and
        # inline generation would compete with the extraction UDF for
        # Python workers.
        from ocr_service_spark.corpus import corpus_df
        from ocr_service_spark.pipeline import process_documents
        from ocr_service_spark.session import build_session

        n_corpus = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "120000"))
        corpus_path = os.environ.get(
            "SPARK_GRAFT_BENCH_CORPUS",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench", f"corpus_{n_corpus}.parquet"))
        spark = build_session("bench_scaling", cores=cores,
                              shuffle_partitions=max(cores, 8))
        if not os.path.exists(corpus_path):
            corpus_df(spark, n_corpus, partitions=128).write.mode(
                "overwrite").parquet(corpus_path)
        docs = spark.read.parquet(corpus_path)
        docs.count()  # warm JVM + page cache
        best = None
        for _ in range(2):
            t0 = time.time()
            process_documents(docs).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        print(json.dumps({"corpus_docs_per_sec": round(n_corpus / best, 1),
                          "cores": cores, "sec": round(best, 3)}))
        return

    if "--scaling" in sys.argv:
        # Two-cluster-size proxy: the same job in fresh JVMs at N and 4N
        # cores. The sandbox host has external load bursts, so the 8- and
        # 32-core runs are INTERLEAVED over several rounds and the best
        # per config wins — a burst then penalizes both configs equally.
        rounds = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "3"))
        pair = os.environ.get("SPARK_GRAFT_SCALE_PAIR", "8,32")
        n_small, n_big = (int(x) for x in pair.split(","))
        best: dict[int, dict] = {}
        for _ in range(rounds):
            for c in (n_small, n_big):
                env = dict(os.environ, SPARK_GRAFT_CPUS=str(c))
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--scaling-child"],
                    env=env, capture_output=True, text=True, check=True)
                r = json.loads(out.stdout.strip().splitlines()[-1])
                if c not in best or r["sec"] < best[c]["sec"]:
                    best[c] = r
        tp_s = best[n_small]["corpus_docs_per_sec"]
        tp_b = best[n_big]["corpus_docs_per_sec"]
        eff = round((tp_b / tp_s) / (n_big / n_small), 3)
        print(json.dumps({
            "metric": f"scaling_efficiency_{n_small}_to_{n_big}_cores",
            "value": eff,
            "unit": "ratio",
            f"docs_per_sec_{n_small}": tp_s,
            f"docs_per_sec_{n_big}": tp_b,
            "sf": sf,
        }))
        return

    r = run_once(sf_dir, cores)
    total = round(sum(r["timings"].values()), 3)
    print(json.dumps({
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": r["timings"],
        "sf": sf,
        "cores": cores,
        "extract_docs_per_sec": r["corpus_docs_per_sec"],
        "flagship_docs_per_sec": r["flagship_docs_per_sec"],
    }))


if __name__ == "__main__":
    main()
