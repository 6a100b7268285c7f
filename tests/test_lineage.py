"""Resumable extraction: per-partition lineage, checkpoint/resume,
orphan invisibility, and final span equality after a resumed run."""

import os

import pandas as pd
import pytest

from fin_ocr_sdk_spark.plans.lineage import (assemble_output,
                                             committed_lineage,
                                             emitted_spans,
                                             run_resumable_extract)
from fin_ocr_sdk_spark.sources.tables import fixture_dir


@pytest.fixture(scope="module")
def spark():
    from fin_ocr_sdk_spark.session import get_spark
    s = get_spark("pytest-lineage", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="module")
def smoke_dir():
    return fixture_dir("smoke", 16)


def test_resume_from_partial_run(spark, smoke_dir, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("lineage_out"))
    docs = spark.read.parquet(os.path.join(smoke_dir, "documents.parquet"))
    media_dir = os.path.join(smoke_dir, "media.parquet")
    all_parts = sorted(os.listdir(media_dir))
    assert len(all_parts) >= 2

    # --- run 1: read only half the media part files (same paths as the
    # full table) — simulates a run that died after committing some
    # partitions
    half = [os.path.join(media_dir, p) for p in all_parts[: len(all_parts) // 2]]
    media_half = spark.read.parquet(*half)
    r1 = run_resumable_extract(spark, docs, media_half, out_dir)
    assert r1.scanned_files == len(half)
    assert r1.skipped_files == 0

    # an orphan span file without a lineage row must stay invisible
    orphan = os.path.join(out_dir, "spans", "deadbeef00000000.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not a real parquet commit")

    # --- run 2: full media; only the remaining files get scanned
    media_full = spark.read.parquet(media_dir)
    r2 = run_resumable_extract(spark, docs, media_full, out_dir)
    assert r2.scanned_files == len(all_parts) - len(half)
    assert r2.skipped_files == len(half)
    # --- run 3: everything committed → pure no-op
    r3 = run_resumable_extract(spark, docs, media_full, out_dir)
    assert r3.scanned_files == 0
    assert r3.skipped_files == len(all_parts)

    lineage = committed_lineage(spark, out_dir).toPandas()
    assert lineage["partition_id"].is_unique
    assert (lineage["doc_count"] > 0).all()
    assert (lineage["span_count"] == lineage["doc_count"] * 4).all()
    assert lineage["checksum"].str.len().eq(32).all()

    # --- final assembled output equals the golden table
    emitted = emitted_spans(spark, out_dir)
    got = (assemble_output(docs, emitted).toPandas()
           .sort_values(["doc_id", "order"]).reset_index(drop=True))
    exp = (pd.read_parquet(os.path.join(smoke_dir, "expected_spans.parquet"))
           .sort_values(["doc_id", "order"]).reset_index(drop=True))
    cols = ["doc_id", "kind", "text", "media_ref", "order"]
    got["order"] = got["order"].astype("int32")
    exp["order"] = exp["order"].astype("int32")
    pd.testing.assert_frame_equal(got[cols], exp[cols])


def test_resume_many_files(spark, smoke_dir, tmp_path_factory):
    """Scale-shape check for the anti-join resume: 200 media part files,
    a partial first run, then a resumed full run — no driver-side set
    diff, counts exact, all committed spans visible."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = spark.read.parquet(os.path.join(smoke_dir, "documents.parquet"))
    base = pq.read_table(os.path.join(smoke_dir, "media.parquet"))
    media_dir = str(tmp_path_factory.mktemp("many_media"))
    n_files = 200
    for i in range(n_files):
        src = base.slice(i % base.num_rows, 1)
        pq.write_table(pa.table({
            "media_ref": [f"img-m{i:05d}"],
            "format": src.column("format").to_pylist(),
            "image": pa.array(src.column("image").to_pylist(),
                              type=pa.binary()),
        }), os.path.join(media_dir, f"part-{i:05d}.parquet"))
    out_dir = str(tmp_path_factory.mktemp("many_out"))
    first = [os.path.join(media_dir, f"part-{i:05d}.parquet")
             for i in range(120)]
    r1 = run_resumable_extract(spark, docs, spark.read.parquet(*first),
                               out_dir)
    assert (r1.scanned_files, r1.skipped_files) == (120, 0)
    r2 = run_resumable_extract(
        spark, docs, spark.read.parquet(media_dir), out_dir)
    assert (r2.scanned_files, r2.skipped_files) == (80, 120)
    assert emitted_spans(spark, out_dir).count() == n_files * 4


def test_checksum_is_deterministic(spark, smoke_dir, tmp_path_factory):
    docs = spark.read.parquet(os.path.join(smoke_dir, "documents.parquet"))
    media = spark.read.parquet(os.path.join(smoke_dir, "media.parquet"))
    out_a = str(tmp_path_factory.mktemp("out_a"))
    out_b = str(tmp_path_factory.mktemp("out_b"))
    run_resumable_extract(spark, docs, media, out_a)
    run_resumable_extract(spark, docs, media, out_b)
    la = (committed_lineage(spark, out_a).toPandas()
          .sort_values("partition_id").reset_index(drop=True))
    lb = (committed_lineage(spark, out_b).toPandas()
          .sort_values("partition_id").reset_index(drop=True))
    assert (la["checksum"] == lb["checksum"]).all()
    assert (la["partition_id"] == lb["partition_id"]).all()
