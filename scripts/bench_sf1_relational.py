"""sf1.0-scale lock points for the heavy relational/training-data
queries (minhash_dedup, dedup_exact, corpus_stats, sequence_packing).

The driver ships testdata only up to sf0.1 (5,000 documents), so the
10x point uses a deterministic synthetic documents table of the same
shape (doc_id BIGINT, text, lang, source, n_chars; seed 137, en-skewed
lang mix like the driver's, ~5% planted exact duplicates so dedup does
real work).  Timings are best-of-2 in one session with rep 1 warming
each query's own paths — the same warm-parity protocol as bench.py —
and are recorded by hand under the PRESERVE marker in
BENCH/BASELINE.md so scale regressions on the heavy ops are visible,
not inferred.

Usage: python scripts/bench_sf1_relational.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = 50_000
SEED = 137
QUERIES = ("dedup_exact", "minhash_dedup", "corpus_stats",
           "sequence_packing", "ngram_jaccard_pairs",
           "embedding_near_dup")

N_VECS = 200_000   # 10x the driver's sf1.0 embeddings table
EMB_DIM = 64
NEAR_DUP_RATE = 0.05   # planted perturbed copies → real LSH clusters

_LANGS = ("en", "en", "en", "en", "zh", "es", "fr", "de")  # driver-like skew
_VOCAB = ("market report quarterly revenue growth product launch "
          "analysis summary update regional forecast outlook margin "
          "segment detail commentary risk capital liquidity trend "
          "index sector volume earnings guidance estimate consensus "
          "dividend buyback leverage spread duration yield curve").split()


N_PARTS = 16   # multi-file table so Spark parallelizes the scan like a
#                real corpus (a single file reads as 2 partitions and
#                times the serial path, not the engine)


def build_docs(path: str) -> str:
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    out = os.path.join(path, "documents.parquet")
    # cache keyed by a generation manifest (same convention as the
    # fixture corpus): any change to the knobs below regenerates, so
    # the 10x lock rows in BENCH/BASELINE.md always describe the corpus
    # this script currently writes
    manifest_path = os.path.join(path, "MANIFEST.json")
    want = {"n_docs": N_DOCS, "seed": SEED, "n_parts": N_PARTS,
            "dup_rate": 0.05,
            "vocab_sha": hashlib.sha256(
                " ".join(_VOCAB).encode()).hexdigest()[:16],
            "langs": "".join(_LANGS)}
    if os.path.isdir(out) and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            if json.load(f) == want:
                return path
    import shutil
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(SEED)
    texts: list[str] = []
    langs: list[str] = []
    for i in range(N_DOCS):
        if i and rng.random() < 0.05:
            # planted exact duplicate of an earlier doc (same text AND
            # lang) — dedup has real clusters to collapse
            j = int(rng.integers(0, len(texts)))
            texts.append(texts[j])
            langs.append(langs[j])
            continue
        n = int(rng.integers(20, 120))
        texts.append(" ".join(rng.choice(_VOCAB, n)))
        langs.append(_LANGS[int(rng.integers(0, len(_LANGS)))])
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    chunk = -(-N_DOCS // N_PARTS)
    for p in range(N_PARTS):
        lo, hi = p * chunk, min(N_DOCS, (p + 1) * chunk)
        pq.write_table(pa.table({
            "doc_id": pa.array(range(lo, hi), type=pa.int64()),
            "text": texts[lo:hi],
            "lang": langs[lo:hi],
            "source": ["synthetic-sf1"] * (hi - lo),
            "n_chars": pa.array([len(t) for t in texts[lo:hi]],
                                type=pa.int64()),
        }), os.path.join(tmp, f"part-{p:05d}.parquet"))
    os.replace(tmp, out)
    with open(manifest_path, "w") as f:
        json.dump(want, f)
    return path


def build_embeddings(path: str) -> None:
    """Deterministic embeddings table shaped like the driver's
    (vec_id BIGINT, embedding list<float>[64], label INT), with
    NEAR_DUP_RATE planted perturbed copies of earlier vectors so the
    LSH near-dup path has real clusters to find."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    out = os.path.join(path, "embeddings.parquet")
    manifest_path = os.path.join(path, "MANIFEST_EMB.json")
    want = {"n_vecs": N_VECS, "seed": SEED, "dim": EMB_DIM,
            "near_dup_rate": NEAR_DUP_RATE, "n_parts": N_PARTS}
    if os.path.isdir(out) and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            if json.load(f) == want:
                return
    import shutil
    shutil.rmtree(out, ignore_errors=True)
    rng = np.random.default_rng(SEED + 1)
    vecs = rng.normal(size=(N_VECS, EMB_DIM)).astype(np.float32)
    dup_mask = rng.random(N_VECS) < NEAR_DUP_RATE
    dup_mask[0] = False
    for i in np.nonzero(dup_mask)[0]:
        j = int(rng.integers(0, i))
        vecs[i] = vecs[j] + 0.05 * rng.normal(size=EMB_DIM).astype(
            np.float32)
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    chunk = -(-N_VECS // N_PARTS)
    for p in range(N_PARTS):
        lo, hi = p * chunk, min(N_VECS, (p + 1) * chunk)
        pq.write_table(pa.table({
            "vec_id": pa.array(range(lo, hi), type=pa.int64()),
            "embedding": pa.array(list(vecs[lo:hi]),
                                  type=pa.list_(pa.float32())),
            "label": pa.array([0] * (hi - lo), type=pa.int32()),
        }), os.path.join(tmp, f"part-{p:05d}.parquet"))
    os.replace(tmp, out)
    with open(manifest_path, "w") as f:
        json.dump(want, f)


def boilerplate_strip_10x(spark, n_docs: int = 2000):
    """The q_boilerplate_strip plan over a 10x synthetic span table
    (the declared query reads a FIXED 200-doc fixture, so its runtime
    cannot be scaled through sf_dir; this mirrors the same plan shape
    — xxhash64 DF agg, broadcast semi + exact recount, broadcast
    anti-join, per-doc renumber — at 10x documents)."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    rng = np.random.default_rng(SEED + 2)
    head, foot, nav = "SITE HEADER NAV", "copyright footer terms", \
        "subscribe newsletter follow"
    rows = []
    for i in range(n_docs):
        off = 0
        rows.append((f"web-{i:06d}", "text", head, "", off)); off += 1
        for _ in range(int(rng.integers(3, 9))):
            t = " ".join(rng.choice(_VOCAB, int(rng.integers(4, 9))))
            rows.append((f"web-{i:06d}", "text", t, "", off)); off += 1
        if i % 3 != 0:
            rows.append((f"web-{i:06d}", "text", nav, "", off)); off += 1
        rows.append((f"web-{i:06d}", "text", foot, "", off))
    s = spark.createDataFrame(
        rows, "doc_id string, kind string, text string, "
              "media_ref string, offset int")
    thresh = n_docs // 2
    cand_h = (s.select(F.xxhash64("text").alias("th"), "doc_id")
              .groupBy("th").agg(F.count_distinct("doc_id").alias("df"))
              .filter(F.col("df") >= thresh).select("th"))
    boiler = (s.withColumn("th", F.xxhash64("text"))
              .join(F.broadcast(cand_h), "th", "semi")
              .groupBy("text")
              .agg(F.count_distinct("doc_id").alias("df"))
              .filter(F.col("df") >= thresh))
    kept = s.join(F.broadcast(boiler.select("text")), "text", "anti")
    w = Window.partitionBy("doc_id").orderBy("offset")
    return (kept.withColumn("order",
                            (F.row_number().over(w) - 1).cast("long"))
            .select("doc_id", "kind", "text", "media_ref", "order"))


def main() -> None:
    from fin_ocr_sdk_spark.session import get_spark
    from fin_ocr_sdk_spark.sources.tables import FIXTURE_ROOT

    import __spark_entry__ as entry
    sf_dir = build_docs(os.path.join(FIXTURE_ROOT, "docs_sf1"))
    build_embeddings(sf_dir)
    spark = get_spark("bench-sf1-relational", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = dict(entry.queries())
    qmap["boilerplate_strip_10x"] = \
        lambda s, _d: boilerplate_strip_10x(s)
    results: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in QUERIES + ("boilerplate_strip_10x",):
        walls = []
        for _ in range(2):
            t0 = time.time()
            n = qmap[name](spark, sf_dir).count()
            walls.append(round(time.time() - t0, 3))
        runs[name] = walls
        results[name] = min(walls)
        print(f"{name:20s} best {min(walls):7.3f}s  runs {walls} "
              f"rows={n}", file=sys.stderr)
    print(json.dumps({"n_docs": N_DOCS, "n_vecs": N_VECS, "seed": SEED,
                      "best_sec": results, "runs_sec": runs}))


if __name__ == "__main__":
    main()
