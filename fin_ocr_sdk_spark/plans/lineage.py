"""Resumable extraction with per-partition lineage (north rule).

Unit of work = one media part file (the same unit the scan stage
parallelizes over).  Each completed unit appends a lineage row

    (partition_id, media_file, doc_count, span_count, checksum,
     run_id, wall_ms)

and its emitted spans land in their own parquet file named by the
partition id.  A span file is visible ONLY through its lineage row, so
a run killed mid-flight leaves at most orphan span files that the
reader never picks up — re-running skips every committed partition via
an anti-join on the lineage table and scans only the remainder.  (On a
real deployment both tables are Iceberg and the span+lineage append is
one atomic snapshot commit; the parquet stand-in keeps the same
protocol with lineage-last ordering.)

The reference has no notion of this — it is request-scoped
(src/context.ts) — but the slow/hung-request accounting it does keep
(src/config.ts:47-49) maps to the wall_ms column here.
"""

from __future__ import annotations

import hashlib
import os
import time
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType)

from .pipeline import SPAN_OUT_COLS, explode_spans, make_scan_batches

LINEAGE_SCHEMA = StructType([
    StructField("partition_id", StringType()),
    StructField("media_file", StringType()),
    StructField("doc_count", LongType()),
    StructField("span_count", LongType()),
    StructField("checksum", StringType()),
    StructField("run_id", StringType()),
    StructField("wall_ms", LongType()),
])

EMITTED_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("sub_order", IntegerType()),
    StructField("kind", StringType()),
    StructField("text", StringType()),
])


def _partition_id(media_file: str) -> str:
    return hashlib.sha1(media_file.encode()).hexdigest()[:16]


def make_lineage_kernel(out_dir: str, run_id: str, templates=None,
                        spark: SparkSession | None = None):
    """mapInPandas kernel over (path): scan one media file, write its
    emitted spans to <out>/spans/<partition_id>.parquet, return the
    lineage row.  The span write happens BEFORE the lineage row is
    returned (lineage-last commit protocol)."""
    if templates is None:
        from .scan import get_default_templates
        templates = get_default_templates()
    bc = spark.sparkContext.broadcast(templates) if spark else None
    spans_dir = os.path.join(out_dir, "spans")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .pipeline import _pin_worker_threads
        _pin_worker_threads()
        import pyarrow as pa
        import pyarrow.parquet as papq
        from .scan import scan_check
        pa.set_cpu_count(1)
        pa.set_io_thread_count(1)
        tmpl = bc.value if bc is not None else templates
        os.makedirs(spans_dir, exist_ok=True)
        for pdf in batches:
            rows = {k: [] for k in ("partition_id", "media_file",
                                    "doc_count", "span_count", "checksum",
                                    "run_id", "wall_ms")}
            for path in pdf["path"]:
                t0 = time.time()
                local = path.replace("file:", "")
                out = {k: [] for k in ("media_ref", "sub_order", "kind",
                                       "text")}
                h = hashlib.sha256()
                n_docs = 0
                # stream record batches like the non-resumable scan
                # (pipeline.scan_media_files): memory stays bounded by
                # the batch, not the part-file size — a 1 GB part must
                # not become a 1 GB Arrow table per task
                pf = papq.ParquetFile(local)
                for rb in pf.iter_batches(batch_size=32,
                                          use_threads=False):
                    for ref, fmt, image in zip(
                            rb.column("media_ref").to_pylist(),
                            rb.column("format").to_pylist(),
                            rb.column("image").to_pylist()):
                        res = scan_check(image, fmt, tmpl)
                        n_docs += 1
                        if res.ok and res.check_info is not None:
                            emitted = (
                                ("micr:line", res.check_info.micr_line),
                                ("micr:routing",
                                 res.check_info.routing_number),
                                ("micr:account",
                                 res.check_info.account_number),
                                ("micr:check",
                                 res.check_info.check_number),
                            )
                        else:
                            emitted = (("micr:error", res.error),)
                        for k, (kind, text) in enumerate(emitted, start=1):
                            out["media_ref"].append(ref)
                            out["sub_order"].append(k)
                            out["kind"].append(kind)
                            out["text"].append(text)
                            h.update(
                                f"{ref}\x00{kind}\x00{text}\x01".encode())
                pid = _partition_id(local)
                span_path = os.path.join(spans_dir, f"{pid}.parquet")
                tmp_path = span_path + f".tmp-{run_id}"
                papq.write_table(pa.table(
                    {k: out[k] for k in out},
                    schema=pa.schema([
                        ("media_ref", pa.string()),
                        ("sub_order", pa.int32()),
                        ("kind", pa.string()),
                        ("text", pa.string()),
                    ])), tmp_path)
                os.replace(tmp_path, span_path)  # atomic on posix
                rows["partition_id"].append(pid)
                rows["media_file"].append(local)
                rows["doc_count"].append(n_docs)
                rows["span_count"].append(len(out["media_ref"]))
                rows["checksum"].append(h.hexdigest()[:32])
                rows["run_id"].append(run_id)
                rows["wall_ms"].append(int((time.time() - t0) * 1000))
            yield pd.DataFrame(rows)

    return kernel


@dataclass
class ExtractRunResult:
    run_id: str
    scanned_files: int
    skipped_files: int
    doc_count: int
    span_count: int


def committed_lineage(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = os.path.join(out_dir, "lineage")
    if not os.path.isdir(path) or not os.listdir(path):
        return None
    return spark.read.parquet(path)


def run_resumable_extract(spark: SparkSession, documents: DataFrame,
                          media: DataFrame, out_dir: str,
                          run_id: str | None = None) -> ExtractRunResult:
    """Scan every media file not yet committed to the lineage table;
    idempotent and restart-safe.  Returns run stats."""
    from .pipeline import media_manifest
    run_id = run_id or uuid.uuid4().hex[:12]
    os.makedirs(out_dir, exist_ok=True)
    # file manifest AND committed-work diff both stay distributed: the
    # manifest is the _metadata-derived listing (pipeline.media_manifest
    # — executors stat, driver never holds the file list), and the diff
    # is an ANTI-JOIN against the lineage table, never a python set —
    # at 10^12-doc scale both sides have millions of rows.  On Iceberg
    # the manifest is the snapshot's file list read as a table.
    manifest = media_manifest(media)
    if manifest is None:
        raise ValueError("resumable extract requires file-backed media")
    n_files = manifest.count()
    files_df = manifest.select("path")
    lineage = committed_lineage(spark, out_dir)
    if lineage is not None:
        files_df = files_df.join(
            lineage.select(F.col("media_file").alias("path")).distinct(),
            "path", "anti")
    n_pending = files_df.count()
    if n_pending:
        nparts = max(1, min(n_pending,
                            spark.sparkContext.defaultParallelism * 2))
        kernel = make_lineage_kernel(out_dir, run_id, spark=spark)
        new_lineage = (files_df.repartition(nparts)
                       .mapInPandas(kernel, LINEAGE_SCHEMA))
        # lineage-last: the append below only happens after every span
        # file in this run has been atomically renamed into place
        (new_lineage.coalesce(1).write.mode("append")
         .parquet(os.path.join(out_dir, "lineage")))
    lineage = committed_lineage(spark, out_dir)
    assert lineage is not None
    agg = lineage.agg(F.sum("doc_count"), F.sum("span_count")).first()
    return ExtractRunResult(
        run_id=run_id,
        scanned_files=n_pending,
        skipped_files=n_files - n_pending,
        doc_count=int(agg[0] or 0),
        span_count=int(agg[1] or 0),
    )


def emitted_spans(spark: SparkSession, out_dir: str) -> DataFrame:
    """All committed emitted spans: ONLY span files with lineage rows
    are read (orphans from failed runs stay invisible).

    Commit membership is enforced with a distributed semi-join on the
    partition id recovered from each span file's name — no driver-side
    collect of the lineage table (millions of rows at 10^12-doc scale).
    Uncommitted ``<pid>.parquet`` orphans may be *opened* by the scan
    but every row they contribute is dropped by the semi-join."""
    lineage = committed_lineage(spark, out_dir)
    if lineage is None:
        raise FileNotFoundError(f"no committed lineage under {out_dir}")
    spans_dir = os.path.join(out_dir, "spans")
    # ignoreCorruptFiles: committed files are complete by construction
    # (tmp-write + atomic rename, lineage-last); the only partial or
    # foreign *.parquet here is an uncommitted orphan, which must not
    # fail the read — the semi-join drops its rows anyway, and the
    # lineage checksum column audits committed-file integrity
    all_spans = (spark.read.schema(EMITTED_SCHEMA)
                 .option("pathGlobFilter", "*.parquet")  # skip .tmp-*
                 .option("ignoreCorruptFiles", "true")
                 .parquet(spans_dir)
                 .withColumn("partition_id",
                             F.regexp_extract(F.input_file_name(),
                                              r"([0-9a-f]+)\.parquet$", 1)))
    return (all_spans
            .join(lineage.select("partition_id").distinct(),
                  "partition_id", "semi")
            .drop("partition_id"))


def assemble_output(documents: DataFrame, emitted: DataFrame) -> DataFrame:
    """Final interleaved span table from originals + committed emitted
    spans (same renumber as pipeline.extract_spans)."""
    spans = explode_spans(documents)
    image_spans = (spans.filter(F.col("kind") == "image")
                   .select("doc_id", "media_ref", "offset"))
    joined = (image_spans.join(emitted, "media_ref")
              .select("doc_id", "kind", "text", "media_ref", "offset",
                      "sub_order"))
    originals = spans.withColumn("sub_order", F.lit(0))
    unioned = originals.unionByName(joined)
    w = Window.partitionBy("doc_id").orderBy("offset", "sub_order")
    return (unioned
            .withColumn("order", (F.row_number().over(w) - F.lit(1))
                        .cast("int"))
            .select(*SPAN_OUT_COLS))
