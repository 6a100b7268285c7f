"""JPEG/GIF codec tests (the lossless PNG/BMP/TIFF round trips are
covered implicitly by every fixture-driven test; these cover the
round-2 pure-python codecs directly)."""

import struct

import numpy as np
import pytest

from fin_ocr_sdk_spark.sources import codecs
from fin_ocr_sdk_spark.sources.gif import decode_gif, encode_gif
from fin_ocr_sdk_spark.sources.jpeg import decode_jpeg, encode_jpeg


def _check_like(rng) -> np.ndarray:
    img = np.full((200, 320), 235, np.uint8)
    img[150:170, 20:300:10] = 10          # glyph-ish bars
    img[30:60, :] = np.linspace(0, 255, 320, dtype=np.uint8)[None, :]
    img[80:120, 100:220] = rng.integers(0, 256, (40, 120), dtype=np.uint8)
    return img


def test_gif_round_trip_exact():
    rng = np.random.default_rng(7)
    for img in (_check_like(rng),
                rng.integers(0, 256, (17, 23), dtype=np.uint8),
                rng.integers(0, 256, (256, 256), dtype=np.uint8),  # forces
                np.zeros((1, 1), dtype=np.uint8)):  # LZW dict reset ^
        assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_interlaced_decode():
    """Decoder must reorder interlaced row passes (GIF89a appendix E)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 19), dtype=np.uint8)
    data = bytearray(encode_gif(img))
    # re-encode the pixel data in interlace order and set the flag
    ih = img.shape[0]
    rows = (list(range(0, ih, 8)) + list(range(4, ih, 8)) +
            list(range(2, ih, 4)) + list(range(1, ih, 2)))
    inter = encode_gif(img[rows])
    # splice: header+palette from `data` (identical), descriptor flag |= 0x40
    desc_off = 13 + 256 * 3
    assert data[desc_off] == 0x2C
    patched = bytearray(inter)
    patched[desc_off + 9] |= 0x40
    assert np.array_equal(decode_gif(bytes(patched)), img)


def test_gif_dispatch_and_sniff():
    img = np.random.default_rng(1).integers(0, 256, (12, 12), dtype=np.uint8)
    data = codecs.encode_image(img, "gif")
    assert np.array_equal(codecs.decode_image(data), img)  # sniffed
    assert np.array_equal(codecs.decode_image(data, "gif"), img)


def test_jpeg_round_trip_close():
    rng = np.random.default_rng(11)
    img = _check_like(rng)
    data = encode_jpeg(img, quality=92)
    out = decode_jpeg(data)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # sharp-edge ringing bounded; flat paper region essentially exact
    assert err[150:170].max() <= 16
    assert err[180:].max() <= 2
    assert err.mean() < 1.0
    assert err.max() <= 24


def test_jpeg_odd_sizes_and_quality():
    rng = np.random.default_rng(13)
    for shape in ((8, 8), (9, 15), (64, 1), (1, 64)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, 95))
        assert out.shape == shape
    flat = np.full((40, 56), 128, np.uint8)
    assert np.abs(decode_jpeg(encode_jpeg(flat, 50)).astype(int)
                  - 128).max() <= 1


def test_jpeg_dispatch_and_sniff():
    img = np.full((24, 24), 200, np.uint8)
    data = codecs.encode_image(img, "jpg")  # alias
    assert codecs.decode_image(data).shape == (24, 24)


def test_jpeg_restart_markers():
    """DRI/RSTn handling: re-encode with restart intervals by splicing a
    DRI segment and restart markers between MCU rows is out of scope for
    the encoder, so exercise the decoder's restart path synthetically:
    two single-MCU images whose entropy segments are joined with RST0."""
    img = np.full((8, 8), 100, np.uint8)
    base = encode_jpeg(img, 90)
    # locate SOS payload and EOI
    sos = base.index(b"\xff\xda")
    (slen,) = struct.unpack(">H", base[sos + 2:sos + 4])
    entropy = base[sos + 2 + slen:-2]
    head = base[:sos]
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 1)  # restart every MCU
    sof = head.index(b"\xff\xc0")
    # widen frame to 2 MCUs tall (16x8) so two entropy segments are read
    head2 = bytearray(head)
    head2[sof + 5:sof + 7] = struct.pack(">H", 16)
    patched = (bytes(head2) + dri + base[sos:sos + 2 + slen] +
               entropy + b"\xff\xd0" + entropy + b"\xff\xd9")
    out = decode_jpeg(patched)
    assert out.shape == (16, 8)
    assert np.abs(out.astype(int) - 100).max() <= 1


def test_unknown_format_raises():
    with pytest.raises(ValueError):
        codecs.decode_image(b"\x00\x01garbage")
    with pytest.raises(ValueError):
        codecs.encode_image(np.zeros((4, 4), np.uint8), "webp")


def test_truncated_streams_never_hang():
    """Every prefix of a valid JPEG/GIF either decodes (zero-filled
    tail) or raises — no hangs, no uncaught index errors outside
    ValueError/struct.error."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    j = encode_jpeg(img, 90)
    g = encode_gif(img)
    for data, dec in ((j, decode_jpeg), (g, decode_gif)):
        for cut in range(10, len(data), max(1, len(data) // 40)):
            try:
                out = dec(data[:cut])
                assert out.dtype == np.uint8
            except (ValueError, struct.error, IndexError):
                pass


def test_decode_image_failure_contract_is_valueerror_only():
    """decode_image normalizes raw-decoder IndexError/struct.error to
    ValueError so one corrupt image becomes a micr:error row, never a
    failed Spark task (pipeline failure contract)."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (32, 40), dtype=np.uint8)
    for data, fmt in ((encode_jpeg(img, 90), "jpeg"),
                      (encode_gif(img), "gif")):
        for cut in range(4, len(data), max(1, len(data) // 25)):
            try:
                codecs.decode_image(data[:cut], fmt)
            except ValueError:
                pass   # the ONLY permitted failure type


def test_jpeg_truncation_and_corruption_never_escape_valueerror():
    """Robustness of the inlined entropy decoder: any truncation of a
    valid stream, and byte corruptions inside the entropy segment,
    either decode to SOME raster or raise ValueError through
    codecs.decode_image — never IndexError/struct.error/KeyError (which a
    Spark task would surface as a crash instead of a micr:error row)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(64, 96)).astype(np.uint8)
    data = bytearray(encode_jpeg(img, quality=80))
    for cut in range(2, len(data), max(1, len(data) // 60)):
        try:
            codecs.decode_image(bytes(data[:cut]), "jpeg")
        except ValueError:
            pass
    for _ in range(80):
        mut = bytearray(data)
        i = int(rng.integers(2, len(mut)))
        mut[i] = int(rng.integers(0, 256))
        try:
            codecs.decode_image(bytes(mut), "jpeg")
        except ValueError:
            pass


def test_jpeg_corrupt_headers_raise_valueerror():
    """Header corruptions that used to escape as ZeroDivisionError
    (zero sampling factors) or StopIteration (SOS referencing an
    unknown component) must surface as ValueError — one bad image is a
    micr:error row, not a dead Spark task."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(32, 48)).astype(np.uint8)
    data = bytearray(encode_jpeg(img, quality=80))
    sof = data.find(b"\xff\xc0")
    assert sof > 0
    # SOF0 layout after marker+len: precision(1) h(2) w(2) nc(1) then
    # per-component [id, hv, tq]
    hv_off = sof + 2 + 2 + 1 + 2 + 2 + 1 + 1
    bad = bytearray(data)
    bad[hv_off] = 0x00          # zero sampling factors
    with pytest.raises(ValueError):
        codecs.decode_image(bytes(bad), "jpeg")
    sos = data.find(b"\xff\xda")
    bad2 = bytearray(data)
    bad2[sos + 2 + 2 + 1] = 0x77  # SOS component id -> unknown
    with pytest.raises(ValueError):
        codecs.decode_image(bytes(bad2), "jpeg")


def test_minhash_band_signatures_tolerates_non_strings():
    from fin_ocr_sdk_spark.functions.minhash import band_signatures
    texts = ["one two three four five", None, float("nan"),
             "alpha beta gamma delta"]
    keep, sig = band_signatures(texts)
    assert keep == [0, 3]
    assert sig.shape == (2, 4)


def test_jpeg_progressive_bit_identical_to_baseline():
    """Successive approximation is exact at completion (two's-complement
    DC, sign-magnitude AC), so the 6-scan progressive decode must equal
    the baseline decode of the same image pixel-for-pixel — flat images
    exercise long EOB runs (EOBn symbols with r>0), noisy regions
    exercise ZRL and AC correction bits."""
    from fin_ocr_sdk_spark.sources.jpeg import encode_jpeg_progressive
    rng = np.random.default_rng(17)
    cases = [
        _check_like(rng),
        np.full((40, 72), 200, np.uint8),                    # long EOBRUNs
        rng.integers(0, 256, (33, 41), dtype=np.uint8),      # dense AC
        np.zeros((1, 1), np.uint8),
        np.linspace(0, 255, 64, dtype=np.uint8)[None, :].repeat(24, 0),
    ]
    for img in cases:
        base = decode_jpeg(encode_jpeg(img, 92))
        prog = decode_jpeg(encode_jpeg_progressive(img, 92))
        assert np.array_equal(base, prog)


def test_jpeg_progressive_sniff_and_dispatch():
    from fin_ocr_sdk_spark.sources.jpeg import encode_jpeg_progressive
    img = np.full((24, 24), 180, np.uint8)
    data = encode_jpeg_progressive(img)
    assert data[3] != 0xC0  # actually SOF2 somewhere in the stream
    assert b"\xff\xc2" in data
    out = codecs.decode_image(data)   # magic sniff: same FFD8 signature
    assert out.shape == (24, 24)


def test_jpeg_progressive_truncation_and_corruption_contract():
    """Same failure contract as baseline: every truncation and random
    single-byte corruption of a progressive file either decodes to some
    raster or raises ValueError via codecs.decode_image — never an
    uncaught IndexError/struct.error/StopIteration."""
    from fin_ocr_sdk_spark.sources.jpeg import encode_jpeg_progressive
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    data = bytearray(encode_jpeg_progressive(img, 85))
    for cut in range(2, len(data), max(1, len(data) // 60)):
        try:
            codecs.decode_image(bytes(data[:cut]), "jpeg")
        except ValueError:
            pass
    for _ in range(80):
        mut = bytearray(data)
        i = int(rng.integers(2, len(mut)))
        mut[i] = int(rng.integers(0, 256))
        try:
            codecs.decode_image(bytes(mut), "jpeg")
        except ValueError:
            pass


def test_jpeg_frame_size_cap_is_valueerror():
    """A corrupted SOF dimension (e.g. height byte flip to 0xFF18)
    would otherwise allocate the full coefficient store — gigabytes of
    lists on the progressive path — before any entropy validation;
    MemoryError is not in decode_image's ValueError contract, so
    oversized frames must be rejected at the header."""
    from fin_ocr_sdk_spark.sources.jpeg import encode_jpeg_progressive
    for enc in (encode_jpeg, encode_jpeg_progressive):
        data = bytearray(enc(np.full((16, 16), 128, np.uint8)))
        sof = data.find(b"\xff\xc0")
        if sof == -1:
            sof = data.find(b"\xff\xc2")
        # SOF payload: len(2) precision(1) height(2) width(2)
        data[sof + 5:sof + 7] = b"\xff\x18"   # height 65304
        data[sof + 7:sof + 9] = b"\xff\x18"   # width 65304
        with pytest.raises(ValueError, match="33 MP"):
            decode_jpeg(bytes(data))
