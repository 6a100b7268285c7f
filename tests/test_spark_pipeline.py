"""Spark-level span-equality test: the distributed pipeline must produce
exactly the golden expected_spans table on the smoke corpus."""

import os

import pandas as pd
import pytest

from fin_ocr_sdk_spark.plans.pipeline import extract_spans, preprocess_only
from fin_ocr_sdk_spark.sources.tables import fixture_dir


@pytest.fixture(scope="module")
def spark():
    from fin_ocr_sdk_spark.session import get_spark
    s = get_spark("pytest-pipeline", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="module")
def smoke_dir():
    return fixture_dir("smoke", 16)


def test_span_equality(spark, smoke_dir):
    docs = spark.read.parquet(os.path.join(smoke_dir, "documents.parquet"))
    media = spark.read.parquet(os.path.join(smoke_dir, "media.parquet"))
    got = (extract_spans(docs, media).toPandas()
           .sort_values(["doc_id", "order"]).reset_index(drop=True))
    exp = (pd.read_parquet(os.path.join(smoke_dir, "expected_spans.parquet"))
           .sort_values(["doc_id", "order"]).reset_index(drop=True))
    cols = ["doc_id", "kind", "text", "media_ref", "order"]
    got["order"] = got["order"].astype("int32")
    exp["order"] = exp["order"].astype("int32")
    pd.testing.assert_frame_equal(got[cols], exp[cols])


def test_no_micr_errors(spark, smoke_dir):
    docs = spark.read.parquet(os.path.join(smoke_dir, "documents.parquet"))
    media = spark.read.parquet(os.path.join(smoke_dir, "media.parquet"))
    out = extract_spans(docs, media)
    assert out.filter(out.kind == "micr:error").count() == 0


def test_filtered_media_respected_by_direct_reads(spark, smoke_dir):
    """Regression: the direct file-read strategy must honor relational
    filters on the media DataFrame (inputFiles() is pre-filter, so the
    semi-join on media_ref re-applies them)."""
    from pyspark.sql import functions as F
    docs = spark.read.parquet(os.path.join(smoke_dir, "documents.parquet"))
    media = (spark.read.parquet(os.path.join(smoke_dir, "media.parquet"))
             .filter(F.col("media_ref") > "img-00000007"))
    out = extract_spans(docs, media)
    excluded = (out.filter((out.doc_id == "doc-00000000")
                           & out.kind.startswith("micr")).count())
    assert excluded == 0  # doc0's media was filtered out
    kept = (out.filter((out.doc_id == "doc-00000009")
                       & (out.kind == "micr:line")).count())
    assert kept == 1
    # renumbering stays dense for the filtered doc
    orders = [r.order for r in out.filter(out.doc_id == "doc-00000000")
              .orderBy("order").collect()]
    assert orders == list(range(len(orders)))


def test_media_strategy_auto_selection(spark, smoke_dir, tmp_path):
    """The pipeline picks the media scan strategy from the media plan:
    bare scan → direct (no corrective semi-join); lightly filtered →
    direct + semi-join; heavily filtered WITHIN the surviving files →
    arrow join path (so only surviving rows are ever decoded — no
    full-file over-scan).  A filter that removes whole files stays on
    the direct path: the post-filter manifest already skips them."""
    from pyspark.sql import functions as F

    from fin_ocr_sdk_spark.plans.pipeline import _choose_media_strategy
    media = spark.read.parquet(os.path.join(smoke_dir, "media.parquet"))
    assert _choose_media_strategy(media) == "direct"
    light = media.filter(F.col("media_ref") >= "img-00000001")  # 15/16
    assert _choose_media_strategy(light) == "direct+semi"
    # whole-file elimination (1 row per smoke part file): direct reads
    # of the 2 surviving files have zero over-scan — keep direct+semi
    aligned = media.filter(F.col("media_ref") < "img-00000002")  # 2/16
    assert _choose_media_strategy(aligned) == "direct+semi"
    # within-file selectivity: pack all 16 rows into 2 files, keep 2
    # rows — the direct path would decode 8x the survivors → arrow
    packed_dir = str(tmp_path / "packed_media")
    media.repartition(2).write.parquet(packed_dir)
    packed = spark.read.parquet(packed_dir)
    heavy = packed.filter(F.col("media_ref").isin(
        "img-00000000", "img-00000001"))
    assert _choose_media_strategy(heavy) == "arrow"


def test_strategy_probe_reads_bounded_files(spark, smoke_dir):
    """The survivor-fraction probe must never scan the whole table:
    its count job reads at most _PROBE_FILES part files (the
    _metadata.file_path IN-filter prunes the rest at the file index),
    so choosing a strategy on a 100 TB table costs O(1) files."""
    from pyspark.sql import functions as F

    from fin_ocr_sdk_spark.plans import pipeline as P

    media = (spark.read.parquet(os.path.join(smoke_dir, "media.parquet"))
             .filter(F.col("media_ref") >= "img-00000001"))
    sample = [r["p"] for r in
              (media.select(F.col("_metadata.file_path").alias("p"))
               .distinct().limit(P._PROBE_FILES).collect())]
    assert 0 < len(sample) <= P._PROBE_FILES
    probe = media.filter(F.col("_metadata.file_path").isin(sample))
    probe.collect()
    leaf = (probe._jdf.queryExecution().executedPlan()
            .collectLeaves().apply(0))
    n_files = leaf.metrics().get("numFiles").get().value()
    assert n_files <= P._PROBE_FILES  # pruned: 4 of 16 smoke files


def test_heavily_filtered_media_same_result_both_paths(spark, smoke_dir):
    """Auto (arrow) and forced-direct strategies agree on a heavily
    filtered media table."""
    from pyspark.sql import functions as F
    docs = spark.read.parquet(os.path.join(smoke_dir, "documents.parquet"))
    media = (spark.read.parquet(os.path.join(smoke_dir, "media.parquet"))
             .filter(F.col("media_ref") < "img-00000002"))
    cols = ["doc_id", "kind", "text", "media_ref", "order"]
    auto = (extract_spans(docs, media).toPandas()[cols]
            .sort_values(["doc_id", "order"]).reset_index(drop=True))
    forced = (extract_spans(docs, media, repartition_scan=False)
              .toPandas()[cols]
              .sort_values(["doc_id", "order"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(auto, forced)
    assert (auto["kind"] == "micr:line").sum() == 2


def test_base64_media_source_end_to_end(spark, smoke_dir, tmp_path):
    """Media delivered as data-URL strings (the reference's base64
    request buffers, src/image.ts:89 / check.ts:198): Catalyst-side
    decode, auto-routed through the arrow path (derived columns make
    direct part-file reads invalid), span output identical."""
    import base64

    from pyspark.sql import functions as F

    from fin_ocr_sdk_spark.plans.pipeline import _choose_media_strategy
    from fin_ocr_sdk_spark.sources.base64_source import decode_base64_media

    docs = spark.read.parquet(os.path.join(smoke_dir, "documents.parquet"))
    raw = pd.read_parquet(os.path.join(smoke_dir, "media.parquet"))
    b64 = spark.createDataFrame(pd.DataFrame({
        "media_ref": raw["media_ref"],
        "image_b64": [
            f"data:image/{fmt};base64," + base64.b64encode(img).decode()
            for fmt, img in zip(raw["format"], raw["image"])],
    }))
    media = decode_base64_media(b64)
    got = media.select("media_ref", "format", "image").toPandas()
    got = got.sort_values("media_ref").reset_index(drop=True)
    assert (got["format"] == raw.sort_values("media_ref")
            .reset_index(drop=True)["format"]).all()
    assert all(bytes(a) == bytes(b) for a, b in zip(
        got["image"], raw.sort_values("media_ref")
        .reset_index(drop=True)["image"]))

    out = (extract_spans(docs, media).toPandas()
           .sort_values(["doc_id", "order"]).reset_index(drop=True))
    exp = (pd.read_parquet(os.path.join(smoke_dir, "expected_spans.parquet"))
           .sort_values(["doc_id", "order"]).reset_index(drop=True))
    cols = ["doc_id", "kind", "text", "media_ref", "order"]
    out["order"] = out["order"].astype("int32")
    exp["order"] = exp["order"].astype("int32")
    pd.testing.assert_frame_equal(out[cols], exp[cols])

    # a parquet-backed but column-derived media table must also refuse
    # direct reads (the part files hold b64 text, not binary images)
    b64_pq = str(tmp_path / "b64_media.parquet")
    b64.write.mode("overwrite").parquet(b64_pq)
    derived = decode_base64_media(spark.read.parquet(b64_pq))
    assert _choose_media_strategy(derived) == "arrow"
    kept = derived.filter(F.col("media_ref") >= "img-00000000")
    assert _choose_media_strategy(kept) == "arrow"


def test_decode_payload_forms():
    import base64

    import numpy as np

    from fin_ocr_sdk_spark.sources import codecs
    img = np.full((9, 11), 77, np.uint8)
    data = codecs.encode_png(img)
    assert codecs.decode_payload(data) == data
    assert codecs.decode_payload(base64.b64encode(data).decode()) == data
    url = "data:image/png;base64," + base64.b64encode(data).decode()
    assert codecs.decode_payload(url) == data
    assert (codecs.decode_image(url) == img).all()  # str accepted + sniffed


def test_preprocess_only(spark, smoke_dir):
    docs = spark.read.parquet(os.path.join(smoke_dir, "documents.parquet"))
    media = spark.read.parquet(os.path.join(smoke_dir, "media.parquet"))
    pre = preprocess_only(docs, media).toPandas()
    assert len(pre) == 16
    assert (pre["overlap"] == "false").all()
    assert pre["band"].map(len).min() > 0


def test_preprocess_only_corrupt_image_is_error_row(spark, smoke_dir):
    """One corrupt image must yield an error row, not a failed task —
    the same failure contract as the main scan path."""
    from pyspark.sql import functions as F
    docs = spark.read.parquet(os.path.join(smoke_dir, "documents.parquet"))
    media = spark.read.parquet(os.path.join(smoke_dir, "media.parquet"))
    media = media.withColumn(
        "image",
        F.when(F.col("media_ref") == "img-00000000",
               F.lit(b"\xff\xd8\xffgarbage")).otherwise(F.col("image")))
    pre = preprocess_only(docs, media).toPandas().set_index("media_ref")
    assert pre.loc["img-00000000", "overlap"].startswith("error: decode")
    assert pre.loc["img-00000000", "band"] is None
    assert (pre.drop("img-00000000")["overlap"] == "false").all()


def test_entry_contract(spark):
    import __spark_entry__ as m
    df = m.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "kind", "text", "media_ref", "order"}
    qs = m.queries()
    oracles = m.oracle_sql()
    assert set(oracles).issubset(set(qs))
    assert len(qs) >= 20


def test_media_manifest_shape(spark, smoke_dir):
    """media_manifest: canonical local paths (no file: URI), one row
    per part file with its size from the engine's listing; None for
    non-file-backed plans (derived columns project _metadata away)."""
    import pandas as pd  # noqa: F811
    from pyspark.sql import functions as F

    from fin_ocr_sdk_spark.plans.pipeline import media_manifest

    media = spark.read.parquet(os.path.join(smoke_dir, "media.parquet"))
    man = media_manifest(media).toPandas()
    assert len(man) == 16  # one smoke part file per doc
    assert man["path"].str.startswith("/").all()
    assert not man["path"].str.contains("file:").any()
    sizes = {os.path.basename(p): os.path.getsize(p) for p in man["path"]}
    assert all(s > 0 for s in sizes.values())
    assert (man.set_index(man["path"].map(os.path.basename))["size"]
            .to_dict() == sizes)
    # filtered plan: only files with surviving rows are listed
    lite = media.filter(F.col("media_ref") < "img-00000002")
    assert len(media_manifest(lite).toPandas()) == 2
    # derived columns: _metadata propagates through the Project, so the
    # BACKING files still list (the strategy layer, not the manifest,
    # is what blocks direct reads of derived plans)
    derived = media.select(F.col("media_ref"),
                           F.base64("image").alias("payload"))
    assert len(media_manifest(derived).toPandas()) == 16
    # in-memory relation: no _metadata -> None
    inmem = spark.createDataFrame([("x", b"y")], "media_ref string, image binary")
    assert media_manifest(inmem) is None


def test_manifest_distributed_path_same_spans(spark, smoke_dir,
                                              monkeypatch):
    """Manifests past _MANIFEST_DRIVER_CAP build slice units entirely
    executor-side (explode + hash repartition — no driver collect of
    the file list).  Force that path with a cap of 0 and assert the
    scan output is identical to the collected-LPT path."""
    from fin_ocr_sdk_spark.plans import pipeline as P

    docs = spark.read.parquet(os.path.join(smoke_dir, "documents.parquet"))
    media = spark.read.parquet(os.path.join(smoke_dir, "media.parquet"))
    base = (extract_spans(docs, media).toPandas()
            .sort_values(["doc_id", "order"]).reset_index(drop=True))
    monkeypatch.setattr(P, "_MANIFEST_DRIVER_CAP", 0)
    # unit table contract holds on the distributed path
    units = P._media_files_df(media).toPandas()
    assert set(units.columns) == {"path", "slice", "n_slices"}
    assert len(units) >= 16                      # >= one unit per file
    assert (units.groupby("path")["n_slices"].nunique() == 1).all()
    per_file = units.groupby("path")["slice"].agg(["min", "max", "count"])
    assert (per_file["min"] == 0).all()
    assert (per_file["max"] == per_file["count"] - 1).all()
    got = (extract_spans(docs, media).toPandas()
           .sort_values(["doc_id", "order"]).reset_index(drop=True))
    cols = ["doc_id", "kind", "text", "media_ref", "order"]
    pd.testing.assert_frame_equal(got[cols], base[cols])
