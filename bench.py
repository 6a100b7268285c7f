"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...}.

The flagship metric is MICR-extraction throughput (docs/sec) over the
synthesized interleaved check corpus (sized by sf); the remaining
headline queries exercise the relational/training-data operators on the
driver's parquet tables.

Scaling-efficiency evidence (N vs 4N cores) is produced by
scripts/bench_scaling.py → BENCH/BASELINE.md; this file stays a
single-run harness so the driver's BENCH_r{N}.json is one line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def bench_docs_for(sf: float) -> int:
    # 25600 docs/sf-unit, floor 128: sf0.1 → 2560 check images (enough
    # work to amortize fixed per-job costs at 32-way parallelism)
    return max(128, int(25600 * sf))


def _cpu_times() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — this host is a VM whose
    hypervisor steals time in ±20-35% windows; reporting steal% makes a
    slow run self-explaining."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        return (vals[7] if len(vals) > 7 else 0, sum(vals))
    except OSError:
        return (0, 0)


def main() -> None:
    sf = sf_of(SF_DIR)
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS",
                                bench_docs_for(sf)))
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{CPUS}]")

    # materialize the check corpus BEFORE timing (input data, not work)
    from fin_ocr_sdk_spark.sources.tables import fixture_dir
    bench_dir = fixture_dir(f"bench{n_docs}", n_docs, lossy=False)

    from fin_ocr_sdk_spark.session import get_spark
    spark = get_spark("bench", master=master)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from fin_ocr_sdk_spark.plans.pipeline import extract_spans

    queries: dict[str, float] = {}
    steal0, total0 = _cpu_times()

    # -- flagship: MICR extraction throughput --------------------------
    docs = spark.read.parquet(os.path.join(bench_dir, "documents.parquet"))
    media = spark.read.parquet(os.path.join(bench_dir, "media.parquet"))
    out_rows = extract_spans(docs, media).count()  # warm-up: full pass
    dt = None
    for _ in range(3):  # best-of-3: host timing noise exceeds ±15%
        t0 = time.time()
        out_rows = extract_spans(docs, media).count()
        d = time.time() - t0
        dt = d if dt is None else min(dt, d)
    queries["micr_extract"] = round(dt, 3)
    docs_per_sec = n_docs / dt

    # -- headline relational / training-data queries -------------------
    qs = entrymod.queries()
    for name in ("pricing_summary", "top_orders_per_customer",
                 "dedup_exact", "minhash_dedup", "simhash",
                 "ann_cosine_topk", "token_count", "text_quality",
                 "lang_id", "doc_fingerprint",
                 "char_best_choice", "line_value_score"):
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        queries[name] = round(time.time() - t0, 3)

    total = round(sum(queries.values()), 3)
    steal1, total1 = _cpu_times()
    steal_pct = (100.0 * (steal1 - steal0) / max(1, total1 - total0))
    result = {
        "metric": "micr_extraction_docs_per_sec",
        "value": round(docs_per_sec, 2),
        "unit": "docs/sec",
        "queries": queries,
        "sf": sf,
        "bench_docs": n_docs,
        "out_rows": out_rows,
        "total_sec": total,
        "master": master,
        "host_steal_pct": round(steal_pct, 1),
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
