"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...}.

The flagship metric is MICR-extraction throughput (docs/sec) over the
synthesized interleaved check corpus (sized by sf), measured with the
same protocol the scaling bench uses: FRESH JVM per repetition, the
lossless and lossy corpora INTERLEAVED across repetitions, best wall
per variant.  This host is a VM with minute-scale interference windows
worth ±20-35% (identical code measured 9.6-16.9 s in round 1/2), so a
best-of-sequential-reps-in-one-process number confounds host drift with
code changes; fresh interleaved JVMs expose both variants to the same
windows and the per-rep wall times are reported so a noisy round is
self-explaining.  Span equality vs the golden table is asserted on the
first repetition of each variant (the output is deterministic).

The remaining headline queries exercise the relational/training-data
operators on the driver's parquet tables in one shared session, each
timed best-of-2 so the first repetition warms exactly the paths the
query hits (warm parity across rounds — see BENCH/BASELINE.md for the
locked per-query baseline numbers future rounds diff against).

Scaling-efficiency evidence (N vs 4N cores) is produced by
scripts/bench_scaling.py → BENCH/BASELINE.md; this file stays a
single-run harness so the driver's BENCH_r{N}.json is one line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))

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


FLAGSHIP_SNIPPET = """
import glob, json, os, sys, time
sys.path.insert(0, {repo!r})
from fin_ocr_sdk_spark.session import get_spark
from fin_ocr_sdk_spark.plans.pipeline import extract_spans
spark = get_spark("bench-flagship", master={master!r})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(os.path.join({bench_dir!r}, "documents.parquet"))
media = spark.read.parquet(os.path.join({bench_dir!r}, "media.parquet"))
# warm-up on a SUBSET of media part files: spins up + reuses python
# workers on every core slot, JITs the kernels, primes the page cache
# for docs — without paying a full extra pass at the measured size
parts = sorted(glob.glob(os.path.join({bench_dir!r},
                                      "media.parquet", "part-*.parquet")))
warm = spark.read.parquet(*parts[:max(1, len(parts) // 8)])
extract_spans(docs, warm).count()
t0 = time.time()
n = extract_spans(docs, media).count()
sec = time.time() - t0
mismatch = -1
if {verify!r}:
    cols = ["doc_id", "kind", "text", "media_ref", "order"]
    out = extract_spans(docs, media).select(cols)
    exp = spark.read.parquet(
        os.path.join({bench_dir!r}, "expected_spans.parquet")).select(cols)
    mismatch = out.exceptAll(exp).count() + exp.exceptAll(out).count()
spark.stop()
print("RESULT " + json.dumps({{"sec": sec, "rows": n,
                               "span_mismatch": mismatch}}))
"""


def run_flagship(master: str, bench_dir: str, verify: bool) -> dict:
    code = FLAGSHIP_SNIPPET.format(repo=REPO, master=master,
                                   bench_dir=bench_dir, verify=verify)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True, cwd=REPO)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line:\n{out.stdout[-2000:]}\n"
                       f"{out.stderr[-2000:]}")


def main() -> None:
    sf = sf_of(SF_DIR)
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS",
                                bench_docs_for(sf)))
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{CPUS}]")
    reps = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_REPS", "3"))

    # materialize both check corpora BEFORE timing (input, not work):
    # the lossless cycle (png/tiff/bmp) measures the engine, the lossy
    # one adds the pure-python jpeg/gif decoders a real corpus pays for
    from fin_ocr_sdk_spark.sources.tables import fixture_dir
    bench_dir = fixture_dir(f"bench{n_docs}", n_docs, lossy=False)
    lossy_dir = fixture_dir(f"bench{n_docs}lossy", n_docs, lossy=True)

    from fin_ocr_sdk_spark.session import get_spark
    spark = get_spark("bench", master=master)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries: dict[str, float] = {}
    steal0, total0 = _cpu_times()

    # -- flagship: MICR extraction throughput --------------------------
    # interleaved best-of-`reps` fresh JVMs per corpus variant
    runs: dict[str, list] = {"lossless": [], "lossy": []}
    best: dict[str, dict] = {}
    span_mismatch: dict[str, int] = {}
    for i in range(reps):
        for variant, vdir in (("lossless", bench_dir),
                              ("lossy", lossy_dir)):
            r = run_flagship(master, vdir, verify=(i == 0))
            runs[variant].append(round(r["sec"], 3))
            if i == 0:
                span_mismatch[variant] = r["span_mismatch"]
            if variant not in best or r["sec"] < best[variant]["sec"]:
                best[variant] = r
    queries["micr_extract"] = round(best["lossless"]["sec"], 3)
    queries["micr_extract_lossy"] = round(best["lossy"]["sec"], 3)
    out_rows = best["lossless"]["rows"]
    docs_per_sec = n_docs / best["lossless"]["sec"]

    # -- headline relational / training-data queries -------------------
    # Warm-parity protocol (locked in BENCH/BASELINE.md): each query is
    # timed best-of-2 IN-SESSION — its own first repetition warms
    # exactly the join/agg/shuffle/codegen paths it hits, so no guessed
    # pre-warm can miss a path (round 3 warmed only token_count's path
    # and pricing_summary's first-ever join absorbed all JVM cold-start,
    # a 5x measurement artifact).  Both reps are reported so a noisy
    # round is self-explaining; the best is the per-query number that
    # BENCH/BASELINE.md locks and future rounds diff against.
    from pyspark.sql import functions as F
    spark.range(1_000_000).select(F.sum("id")).collect()
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    qs = entrymod.queries()
    query_runs: dict[str, list] = {}
    for name in ("pricing_summary", "top_orders_per_customer",
                 "dedup_exact", "minhash_dedup", "simhash",
                 "ann_cosine_topk", "token_count", "text_quality",
                 "lang_id", "doc_fingerprint",
                 "char_best_choice", "line_value_score",
                 "sequence_packing", "corpus_stats",
                 "pdf_text_extract", "html_main_content"):
        times = []
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            times.append(round(time.time() - t0, 3))
        query_runs[name] = times
        queries[name] = min(times)

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
        "flagship_protocol":
            f"best-of-{reps} fresh JVMs per variant, variants "
            "interleaved, warm-up subset inside each JVM",
        "relational_protocol":
            "best-of-2 per query in one shared session; rep 1 warms "
            "each query's own paths (warm parity across rounds)",
        "query_runs_sec": query_runs,
        "flagship_runs_sec": runs,
        "lossy_docs_per_sec": round(n_docs / best["lossy"]["sec"], 2),
        "span_mismatch": span_mismatch,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
