"""The distributed extraction pipeline — Spark shape of Check.scan.

Dataflow (SURVEY.md §2.8):

    documents ──explode spans──┐
                               ├─ text/image spans pass through
    image spans ⋈ media ───────┘
          │  equi-join on media_ref (both sides co-shuffled; AQE handles
          │  skew; at 100 TB pre-bucket both tables by media_ref)
          ▼
    byte-weighted repartition (skew axis = media bytes/row, not rows)
          ▼
    mapInPandas(scan_batches)   ← ALL image work: decode → deskew →
          │                        band → segment → classify → grammar;
          │                        vectorized NumPy per Arrow batch,
          │                        templates built once per worker
          ▼
    emitted micr:* spans ∪ original spans
          ▼
    window renumber within doc → (doc_id, kind, text, media_ref, order)

Everything relational stays in Catalyst (joins/filters/windows); the
opaque per-image kernels are the only Python.  Zero cross-document
dataflow → linear scale-out; the only shuffles are the media join and
the final per-doc renumber.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, StringType,
                               StructField, StructType)

SCAN_OUT_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("offset", IntegerType()),
    StructField("sub_order", IntegerType()),
    StructField("kind", StringType()),
    StructField("text", StringType()),
    StructField("media_ref", StringType()),
])

SPAN_OUT_COLS = ("doc_id", "kind", "text", "media_ref", "order")


def make_scan_batches(templates=None):
    """Build the mapInPandas kernel with the template tensor captured in
    the closure: constructed ONCE on the driver (~145 KB pickled) and
    shipped to every worker, instead of each python worker re-rendering
    and re-extracting the glyph sheet (which serializes poorly when 32
    cold workers start at once).  Mirrors the reference's init-once
    translator (src/ocr.ts:44-56) with Spark's broadcast-by-closure."""
    if templates is None:
        from ..plans.scan import get_default_templates
        templates = get_default_templates()

    def scan_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return scan_batches(batches, templates)

    return scan_fn


def scan_batches(batches: Iterator[pd.DataFrame],
                 templates=None) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, media_ref, offset, format, image) →
    emitted OCR spans (micr:line/routing/account/check), sub_order 1..4
    (the source image span itself passes through outside the UDF)."""
    from ..plans.scan import get_default_templates, scan_check
    if templates is None:
        templates = get_default_templates()
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in
                                ("doc_id", "offset", "sub_order", "kind",
                                 "text", "media_ref")}
        for doc_id, media_ref, offset, fmt, image in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["offset"],
                pdf["format"], pdf["image"]):
            res = scan_check(bytes(image), fmt, templates)
            if res.ok and res.check_info is not None:
                emitted = (
                    ("micr:line", res.check_info.micr_line),
                    ("micr:routing", res.check_info.routing_number),
                    ("micr:account", res.check_info.account_number),
                    ("micr:check", res.check_info.check_number),
                )
            else:
                # extraction failure: emit an error span so lineage counts
                # reconcile (every image yields at least one emitted row)
                emitted = (("micr:error", res.error),)
            for k, (kind, text) in enumerate(emitted, start=1):
                out["doc_id"].append(doc_id)
                out["offset"].append(int(offset))
                out["sub_order"].append(k)
                out["kind"].append(kind)
                out["text"].append(text)
                out["media_ref"].append(media_ref)
        yield pd.DataFrame(out)


def byte_weighted_partitions(df: DataFrame, bytes_col: str = "image",
                             target_bytes: int = 64 << 20) -> int:
    """Partition count sized by total payload bytes, not row count — the
    skew axis for media tables is bytes/row (SURVEY §4).  One cheap agg
    job; at 100 TB this statistic comes from table metadata instead.
    Floored at the cluster's default parallelism so small inputs still
    use every core (the byte count dominates once input >> cluster)."""
    total = df.select(F.sum(F.length(F.col(bytes_col)))).first()[0] or 0
    floor = df.sparkSession.sparkContext.defaultParallelism
    return max(floor, math.ceil(total / target_bytes))


def explode_spans(documents: DataFrame) -> DataFrame:
    return (documents
            .select("doc_id", F.explode("spans").alias("s"))
            .select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"))


def extract_spans(documents: DataFrame, media: DataFrame,
                  target_partition_bytes: int = 64 << 20,
                  repartition_scan: bool = True) -> DataFrame:
    """Full pipeline: interleaved documents + media → output span table
    under the (kind, text, media_ref, order) invariant."""
    spans = explode_spans(documents)
    image_spans = (spans.filter(F.col("kind") == "image")
                   .select("doc_id", "media_ref", "offset"))
    scan_input = image_spans.join(media, "media_ref")
    if repartition_scan:
        nparts = byte_weighted_partitions(media, "image",
                                          target_partition_bytes)
        # hash-distribute on media_ref: refs are unique → uniform load;
        # bytes/row variance is bounded by the canvas size here, and AQE
        # rebalances stragglers at real scale
        scan_input = scan_input.repartition(nparts, "media_ref")
    emitted = scan_input.mapInPandas(make_scan_batches(), SCAN_OUT_SCHEMA)
    originals = spans.withColumn("sub_order", F.lit(0))
    unioned = originals.unionByName(
        emitted.select("doc_id", "kind", "text", "media_ref",
                       "offset", "sub_order"))
    w = Window.partitionBy("doc_id").orderBy("offset", "sub_order")
    return (unioned
            .withColumn("order", (F.row_number().over(w) - F.lit(1))
                        .cast("int"))
            .select(*SPAN_OUT_COLS))


def preprocess_only(documents: DataFrame, media: DataFrame) -> DataFrame:
    """Entry point 2 analog (CheckMgr.preprocess, src/check.ts:116-127):
    stop after band isolation; emit per-image band geometry + overlap
    flag.  This is the pipeline's debug/inspection mode and its natural
    checkpoint boundary."""
    import pandas as pd  # noqa: F811

    schema = StructType([
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("overlap", StringType()),
        StructField("band", BinaryType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..operators import kernels as K
        from ..plans.scan import (find_micr_line, get_default_templates,
                                  get_micr_band)
        from ..sources import codecs
        templates = get_default_templates()
        for pdf in it:
            rows: dict[str, list] = {"doc_id": [], "media_ref": [],
                                     "overlap": [], "band": []}
            for doc_id, media_ref, fmt, image in zip(
                    pdf["doc_id"], pdf["media_ref"], pdf["format"],
                    pdf["image"]):
                gray = K.grayscale(codecs.decode_image(bytes(image), fmt))
                band = get_micr_band(gray)
                line = find_micr_line(band, templates)
                rows["doc_id"].append(doc_id)
                rows["media_ref"].append(media_ref)
                rows["overlap"].append(
                    "" if line is None else str(line.overlap).lower())
                rows["band"].append(codecs.encode_png(band))
            yield pd.DataFrame(rows)

    spans = explode_spans(documents)
    image_spans = (spans.filter(F.col("kind") == "image")
                   .select("doc_id", "media_ref"))
    return image_spans.join(media, "media_ref").mapInPandas(batches, schema)
