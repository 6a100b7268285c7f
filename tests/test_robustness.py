"""Robustness checks beyond the main fixture grid: noise on the MICR
band itself (the 2x2 clean stage's job, src/check.ts:209-219) and the
byte-weighted partition statistic."""

import os

import numpy as np
import pytest

from fin_ocr_sdk_spark.plans.scan import get_default_templates, scan_check
from fin_ocr_sdk_spark.sources import codecs
from fin_ocr_sdk_spark.sources.fixtures import CheckSpec, compose_check

MICR = "U2154U T031100649T 4400000084U"


@pytest.mark.parametrize("density", [0.001, 0.003])
def test_salt_pepper_on_band(density):
    """Specks inside the bottom band are removed by the erode/dilate
    clean (and the size-relative refilter drops survivors)."""
    rng = np.random.default_rng(12)
    spec = CheckSpec(micr_text=MICR, skew=0.0, fmt="png",
                     dark_header=False, noise=False)
    img = compose_check(spec, rng)
    h, w = img.shape
    n = int(h * w * density)
    ys = rng.integers(int(h * 0.6), h, n)
    xs = rng.integers(0, w, n)
    img[ys, xs] = np.where(rng.random(n) < 0.5, 0, 255).astype(np.uint8)
    res = scan_check(codecs.encode_image(img, "png"), "png",
                     get_default_templates())
    assert res.ok
    assert res.micr_value == MICR.replace(" ", "")


def test_byte_weighted_partitions_metadata_path():
    """The statistic comes from parquet footers (no data read) and is
    floored at default parallelism."""
    from fin_ocr_sdk_spark.plans.pipeline import byte_weighted_partitions
    from fin_ocr_sdk_spark.session import get_spark
    from fin_ocr_sdk_spark.sources.tables import fixture_dir
    d = fixture_dir("smoke", 16)
    spark = get_spark("pytest-bwp", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        media = spark.read.parquet(os.path.join(d, "media.parquet"))
        # tiny target → count driven by uncompressed bytes (~8 MB for
        # 16 docs at 1280x400)
        n_small_target = byte_weighted_partitions(media, "image",
                                                  target_bytes=1 << 20)
        assert n_small_target >= 4  # ~5 MB of stored image bytes / 1 MB
        # huge target → floored at defaultParallelism (4)
        n_floor = byte_weighted_partitions(media, "image",
                                           target_bytes=1 << 40)
        assert n_floor == spark.sparkContext.defaultParallelism
    finally:
        spark.stop()
