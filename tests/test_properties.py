"""Property-based tests (hypothesis): grammar round trips, degree-math
invariants, GIF losslessness for arbitrary 8-bit grayscale arrays."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fin_ocr_sdk_spark.functions.geometry import (degree_average,
                                                  degree_delta,
                                                  degree_normalize)
from fin_ocr_sdk_spark.functions.micr import (parse_micr,
                                              remove_leading_zeros,
                                              x9_to_micr)
from fin_ocr_sdk_spark.sources.gif import decode_gif, encode_gif

digits = st.text(alphabet="0123456789", min_size=1, max_size=10)


@given(routing=st.text(alphabet="0123456789", min_size=8, max_size=8),
       check_digit=st.text(alphabet="0123456789", min_size=1, max_size=1),
       account=digits,
       aux=st.one_of(st.just(""), digits))
@settings(max_examples=100, deadline=None)
def test_x9_round_trip(routing, check_digit, account, aux):
    """X9 fields composed to MICR then parsed back recover the fields
    (check number and leading-zero stripping per the reference rules:
    check comes from aux-on-us when present, src/checkUtil.ts)."""
    line = x9_to_micr(routing, check_digit, account + "/", aux)
    info = parse_micr(line)
    assert info.routing_number == routing + check_digit
    # accounts keep their digits verbatim; only check numbers strip
    # leading zeros (reference golden: "T012T034U056" -> check "56")
    assert info.account_number == account
    if aux:
        assert info.check_number == remove_leading_zeros(aux)


@given(st.floats(-1e4, 1e4), st.floats(-1e4, 1e4))
@settings(max_examples=200, deadline=None)
def test_degree_math_invariants(d1, d2):
    # reference-parity note: normalize(x) for a tiny negative x rounds
    # to exactly 360.0 in doubles (the JS original does the same), so
    # the closed upper bound is 360, not 360-exclusive
    n1, n2 = degree_normalize(d1), degree_normalize(d2)
    assert 0 <= n1 <= 360
    delta = degree_delta(n1, n2)
    assert 0 <= delta <= 180
    assert delta == degree_delta(n2, n1)  # symmetric
    avg = degree_average(n1, n2)
    assert 0 <= avg <= 360


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_gif_lossless_property(h, w, seed):
    img = np.random.default_rng(seed).integers(
        0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img)), img)
