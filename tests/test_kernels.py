"""Kernel unit tests vs closed-form cases (SURVEY.md §5.3)."""

import numpy as np
import pytest

from fin_ocr_sdk_spark.operators import kernels as K


def test_grayscale_noop_and_weights():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert K.grayscale(g) is g
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[..., 0] = 100  # R
    out = K.grayscale(rgb)
    assert out.shape == (2, 2)
    assert abs(int(out[0, 0]) - round(0.299 * 100)) <= 1


def test_grayscale_channel_order_is_rgb():
    """Pin RGB channel order: pure red gets the 0.299 weight and pure
    blue the 0.114 weight — a BGR input would swap these."""
    red = np.zeros((1, 1, 3), dtype=np.uint8)
    red[..., 0] = 255
    blue = np.zeros((1, 1, 3), dtype=np.uint8)
    blue[..., 2] = 255
    assert int(K.grayscale(red)[0, 0]) == round(0.299 * 255)   # 76
    assert int(K.grayscale(blue)[0, 0]) == round(0.114 * 255)  # 29


def test_bitwise_not():
    img = np.array([[0, 255, 128]], dtype=np.uint8)
    assert (K.bitwise_not(img) == [[255, 0, 127]]).all()


def test_gaussian_blur_preserves_constant():
    img = np.full((10, 10), 77, dtype=np.uint8)
    assert (K.gaussian_blur(img, 3) == 77).all()
    assert (K.gaussian_blur(img, 7) == 77).all()


def test_gaussian_blur_impulse_k3():
    img = np.zeros((5, 5), dtype=np.uint8)
    img[2, 2] = 255
    out = K.gaussian_blur(img, 3)
    # binomial 3x3: center 255/4≈64, edge 255/8≈32, corner 255/16≈16
    assert out[2, 2] == round(255 * 0.25)
    assert out[2, 1] == round(255 * 0.125)
    assert out[1, 1] == round(255 * 0.0625)


def test_otsu_bimodal():
    img = np.array([[10] * 50 + [200] * 50], dtype=np.uint8)
    t = K.otsu_threshold(img)
    assert 10 <= t < 200
    binary = K.otsu_binary_inv(img)
    # INV: dark pixels become 255 (ink), bright become 0
    assert (binary[0, :50] == 255).all()
    assert (binary[0, 50:] == 0).all()


def test_threshold_binary_inv():
    img = np.array([[0, 100, 200]], dtype=np.uint8)
    assert (K.threshold_binary_inv(img, 100) == [[255, 255, 0]]).all()


def test_adaptive_threshold_flips_polarity():
    # black text (low) on white background (high) → text becomes 255
    img = np.full((40, 40), 230, dtype=np.uint8)
    img[18:23, 5:35] = 20  # a dark stroke
    out = K.adaptive_threshold_gaussian_inv(img, 19, 1)
    assert (out[20, 10:30] == 255).all()
    # far-away background stays 0
    assert out[5, 5] == 0


def test_erode_dilate_cross():
    img = np.zeros((7, 7), dtype=np.uint8)
    img[3, 1:6] = 255
    img[1:6, 3] = 255
    d = K.dilate(img, 3, 3)
    assert d[2, 2] == 255  # grown into the corner
    e = K.erode(d, 3, 3)
    # open-ish: center survives
    assert e[3, 3] == 255
    # single pixel is destroyed by 3x3 erode
    solo = np.zeros((5, 5), dtype=np.uint8)
    solo[2, 2] = 255
    assert (K.erode(solo, 3, 3) == 0).all()


def test_erode_dilate_2x2_anchor():
    # 2x2 kernel with OpenCV anchor (1,1): window spans (y-1..y, x-1..x)
    img = np.zeros((4, 4), dtype=np.uint8)
    img[1, 1] = 255
    d = K.dilate(img, 2, 2)
    assert d[1, 1] == 255 and d[2, 2] == 255 and d[1, 2] == 255 and d[2, 1] == 255
    assert d[0, 0] == 0


def test_morph_open_close_identity_on_big_block():
    img = np.zeros((30, 30), dtype=np.uint8)
    img[5:25, 5:25] = 255
    assert (K.morph_open(img, 5, 5) == img).all()
    assert (K.morph_close(img, 5, 5) == img).all()


def test_resize_area_exact_downscale():
    img = np.array([[0, 0, 255, 255],
                    [0, 0, 255, 255],
                    [255, 255, 0, 0],
                    [255, 255, 0, 0]], dtype=np.uint8)
    out = K.resize_area(img, (2, 2))
    assert (out == np.array([[0, 255], [255, 0]])).all()
    img2 = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out2 = K.resize_area(img2, (2, 2))
    # each output = mean of its 2x2 block
    expect = np.array([[2.5, 4.5], [10.5, 12.5]])
    assert np.abs(out2 - expect).max() <= 0.5


def test_resize_area_shape_upscale():
    img = np.array([[0, 255]], dtype=np.uint8)
    out = K.resize_area(img, (4, 2))
    assert out.shape == (2, 4)
    assert out[0, 0] == 0 and out[0, 3] == 255


def test_rotate_90_roundtrip_small_angle():
    img = np.zeros((41, 81), dtype=np.uint8)
    img[18:24, 10:70] = 255  # horizontal bar
    rot = K.rotate(img, 5.0)
    back = K.rotate(rot, -5.0)
    # interior of the bar survives the round trip
    assert back[20, 40] > 200
    assert back[5, 40] < 50
    assert K.rotate(img, 0.0) is not img
    assert (K.rotate(img, 0.0) == img).all()


def test_min_area_rect_axis_aligned():
    pts = [(0, 0), (10, 0), (10, 4), (0, 4)]
    w, h, a = K.min_area_rect(np.array(pts))
    assert {round(w), round(h)} == {10, 4}
    assert a == pytest.approx(0, abs=1e-6) or a == pytest.approx(90, abs=1e-6)


def test_min_area_rect_rotated_bar():
    # bar rotated by 30 degrees
    base = np.array([(x, 0) for x in range(0, 50)] +
                    [(x, 3) for x in range(0, 50)], dtype=np.float64)
    ang = np.radians(30)
    rot = base @ np.array([[np.cos(ang), np.sin(ang)],
                           [-np.sin(ang), np.cos(ang)]])
    w, h, a = K.min_area_rect(rot)
    long_side_angle = a if w > h else (a + 90) % 180
    assert long_side_angle == pytest.approx(30, abs=1.0)


def test_skew_angle_rule():
    assert K.skew_angle_from_rect(100, 10, 2.0) == 2.0
    assert K.skew_angle_from_rect(10, 100, 88.0) == -2.0


def test_label_components_basic():
    img = np.zeros((10, 10), dtype=np.uint8)
    img[1:3, 1:3] = 255
    img[6:9, 6:9] = 255
    img[5, 5] = 255  # diagonal touch to the 6:9 block → 8-conn merges
    regions = K.find_regions(img)
    assert len(regions) == 2
    assert regions[0].rect == (1, 1, 2, 2)
    assert regions[0].area == 4 and regions[0].area2 == 4
    assert regions[1].rect == (5, 5, 4, 4)
    assert regions[1].area2 == 10  # 9 + diagonal pixel
    assert [r.idx for r in regions] == [0, 1]


def test_label_components_u_shape_merges():
    img = np.zeros((6, 8), dtype=np.uint8)
    img[1:5, 1] = 255
    img[1:5, 6] = 255
    img[4, 1:7] = 255  # bottom bridge → single component
    regions = K.find_regions(img)
    assert len(regions) == 1
    assert regions[0].rect == (1, 1, 6, 4)


def test_region_point_queries():
    img = np.zeros((10, 10), dtype=np.uint8)
    img[2:8, 3:7] = 255
    r = K.find_regions(img)[0]
    assert r.minmax_x_in_yrange(0, 1) is None
    assert r.minmax_x_in_yrange(2, 4) == (3, 6)
    sub = r.points_in_rect((0, 0, 4, 4))
    assert sub is not None
    assert sub[:2] == (3, 2)


def test_filter_regions():
    img = np.zeros((20, 20), dtype=np.uint8)
    img[1:3, 1:3] = 255      # small 2x2
    img[5:15, 5:15] = 255    # big 10x10
    regions = K.find_regions(img)
    out = K.filter_regions(regions, min_width=5)
    assert len(out) == 1 and out[0].rect[2] == 10
    out2 = K.filter_regions(regions, max_area=50)
    assert len(out2) == 1 and out2[0].area2 == 4
    out3 = K.filter_regions(regions, borders=["top"], size_wh=(20, 20))
    assert len(out3) == 2  # neither touches y=0
    img2 = np.zeros((20, 20), dtype=np.uint8)
    img2[0:2, 0:2] = 255
    regions2 = K.find_regions(img2)
    assert K.filter_regions(regions2, borders=["top"], size_wh=(20, 20)) == []


def test_clear_padding():
    img = np.full((10, 10), 255, dtype=np.uint8)
    K.clear_padding(img, 2)
    assert (img[:2, :] == 0).all() and (img[-2:, :] == 0).all()
    assert (img[:, :2] == 0).all() and (img[:, -2:] == 0).all()
    assert (img[2:-2, 2:-2] == 255).all()


def test_clear_by_vertical_thickness():
    img = np.zeros((20, 20), dtype=np.uint8)
    img[5:7, 2:18] = 255   # thin horizontal stroke (span 1 <= 3)
    img[3:15, 10] = 255    # tall column at x=10 (span 11 > 3)
    K.clear_by_vertical_thickness(img, 3)
    assert (img[:, 10][3:15] == 255).all()  # tall column survives
    assert img[5, 5] == 0                   # thin stroke cleared


def test_hv_thin():
    img = np.zeros((20, 20), dtype=np.uint8)
    img[10, 2:18] = 255   # long horizontal run (h=16 >= minH)
    img[2, 2] = 255       # isolated pixel
    K.hv_thin(img, 5, 5, (0, 0, 20, 20))
    assert (img[10, 2:18] == 255).all()
    assert img[2, 2] == 0


def test_zhang_suen_thins_block():
    img = np.zeros((12, 30), dtype=np.uint8)
    img[4:9, 3:27] = 255
    out = K.zhang_suen_skeletonize(img)
    # skeleton is thinner than the original, still non-empty
    assert 0 < (out > 0).sum() < (img > 0).sum()


def test_is_white_background():
    assert K.is_white_background(np.full((50, 50), 200, dtype=np.uint8))
    assert not K.is_white_background(np.full((50, 50), 50, dtype=np.uint8))


def test_crop_fraction_bottom_band():
    img = np.arange(100, dtype=np.uint8).reshape(10, 10)
    band = K.crop_fraction(img, begin_h=0.60)
    assert band.shape == (4, 10)
    assert band[0, 0] == 60


def test_normalize_minmax():
    img = np.array([[10, 20, 30]], dtype=np.uint8)
    out = K.normalize_minmax(img)
    assert out[0, 0] == 0 and out[0, 2] == 255
    flat = np.full((3, 3), 9, dtype=np.uint8)
    assert (K.normalize_minmax(flat) == 0).all()


def test_pad_border():
    img = np.full((2, 2), 7, dtype=np.uint8)
    out = K.pad_border(img, 1, 1, 2, 2, value=3)
    assert out.shape == (4, 6)
    assert out[0, 0] == 3 and out[1, 2] == 7


def test_rgb_kernel():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = K.rgb(img)
    assert out.shape == (3, 4, 3)
    assert (out[..., 0] == img).all() and (out[..., 2] == img).all()
    assert np.array_equal(K.grayscale(out), img)  # round trip


def test_approx_poly_dp_square():
    # a dense square outline simplifies to its 4 corners
    pts = []
    for i in range(20):
        pts.append((i, 0))
    for i in range(20):
        pts.append((20, i))
    for i in range(20):
        pts.append((20 - i, 20))
    for i in range(20):
        pts.append((0, 20 - i))
    pts = np.array(pts, dtype=float)
    approx = K.approx_poly_dp(pts, 0.01 * K.arc_length(pts, True), True)
    assert len(approx) == 4
    assert K.get_num_sides(pts) == 32  # 4 vertices x 8 (the .data quirk)
    assert K.arc_length(pts, True) == pytest.approx(80.0)
    # open polyline: collinear chain collapses to endpoints
    line = np.array([(0, 0), (1, 0.01), (2, 0), (3, -0.01), (4, 0)])
    assert len(K.approx_poly_dp(line, 0.1, closed=False)) == 2
