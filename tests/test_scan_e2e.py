"""End-to-end scan tests (pure Python, no Spark): every fixture variant
must reproduce its golden MICR string and fields exactly — the
(kind, text, media_ref, order) invariant at the single-document level."""

import numpy as np
import pytest

from fin_ocr_sdk_spark.functions.micr import parse_micr
from fin_ocr_sdk_spark.operators import kernels as K
from fin_ocr_sdk_spark.plans.scan import (get_default_templates,
                                          get_micr_band, scan_check,
                                          skew_angle)
from fin_ocr_sdk_spark.sources import codecs
from fin_ocr_sdk_spark.sources.fixtures import (CheckSpec, compose_check,
                                                make_spec)


@pytest.fixture(scope="module")
def templates():
    return get_default_templates()


GOLDEN_SAMPLE = "U0024154U T031100649T 4400000084U"


def test_reference_golden_micr_line(templates):
    """The reference's own E2E golden (test/check.test.ts:22):
    micr line U0024154UT031100649T4400000084U."""
    rng = np.random.default_rng(1)
    spec = CheckSpec(micr_text=GOLDEN_SAMPLE, skew=0.0, fmt="png",
                     dark_header=False, noise=False)
    img = compose_check(spec, rng)
    res = scan_check(codecs.encode_image(img, "png"), "png", templates)
    assert res.ok
    assert res.micr_value == "U0024154UT031100649T4400000084U"
    assert res.check_info.routing_number == "031100649"
    assert res.check_info.account_number == "4400000084"
    assert res.check_info.check_number == "24154"


@pytest.mark.parametrize("i", range(12))
def test_variant_grid(i, templates):
    """Variant axes: skew x format x dark-header x noise."""
    rng = np.random.default_rng(42 * 1_000_003 + i)
    spec = make_spec(i, rng)
    img = compose_check(spec, rng)
    res = scan_check(codecs.encode_image(img, spec.fmt), spec.fmt, templates)
    assert res.ok, res.error
    assert res.micr_value == spec.micr_clean
    info = parse_micr(spec.micr_clean)
    assert res.check_info == info


def test_skew_recovery():
    """Deskew recovers the applied rotation to within 0.5 degrees."""
    rng = np.random.default_rng(5)
    for applied in (1.5, -1.5, 3.0, -3.0):
        spec = CheckSpec(micr_text=GOLDEN_SAMPLE, skew=applied, fmt="png",
                         dark_header=False, noise=False)
        img = compose_check(spec, rng)
        measured = skew_angle(K.grayscale(img))
        # rotate(a) then rotate(b) composes to rotate(a+b), so the
        # correcting angle is the negative of the applied skew
        assert measured == pytest.approx(-applied, abs=0.5)


def test_band_crop_contains_micr(templates):
    rng = np.random.default_rng(9)
    # NOTE: the seed search anchors on a '0' glyph (src/check.ts:311),
    # so MICR lines must contain one — true of real routing numbers and
    # guaranteed by the fixture generator
    spec = CheckSpec(micr_text="T103T 4506U", skew=0.0, fmt="png",
                     dark_header=False, noise=False)
    img = compose_check(spec, rng)
    band = get_micr_band(K.grayscale(img))
    assert band.shape[0] == pytest.approx(img.shape[0] * 0.4, abs=2)
    res = scan_check(codecs.encode_image(img, "png"), "png", templates)
    assert res.check_info.routing_number == "103"
    assert res.check_info.account_number == "4506"


def test_decode_failure_is_reported(templates):
    res = scan_check(b"not an image", "png", templates)
    assert not res.ok
    assert "decode" in res.error


def test_jpeg_stub(templates):
    res = scan_check(b"\xff\xd8\xff\xe0fake", "jpeg", templates)
    assert not res.ok
    assert "stub" in res.error
