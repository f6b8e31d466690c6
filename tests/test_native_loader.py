"""Native C++ loader (native/ucsa_loader.cpp via ctypes): decode parity
with cv2 and regression coverage for the round-3 review fixes (sub-8-bit
grayscale expansion; batch completion signaling)."""

import cv2
import numpy as np
import pytest

from ucsa_neural_rendering_tpu.data import native_loader

pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native loader unavailable")


def test_load_label_uint8_and_uint16(tmp_path):
    h, w = 12, 16
    lab8 = (np.arange(h * w) % 41).astype(np.uint8).reshape(h, w)
    p8 = str(tmp_path / "l8.png")
    cv2.imwrite(p8, lab8)
    out = native_loader.load_label(p8, w, h)
    np.testing.assert_array_equal(out, lab8)

    lab16 = (np.arange(h * w) % 1500).astype(np.uint16).reshape(h, w)
    p16 = str(tmp_path / "l16.png")
    cv2.imwrite(p16, lab16)
    out = native_loader.load_label(p16, w, h)
    np.testing.assert_array_equal(out, lab16)


def test_load_label_sub8bit_gray(tmp_path):
    """1-bit grayscale PNG: libpng packs 8 px/byte; without
    png_set_expand_gray_1_2_4_to_8 the int32 copy loop read w*h bytes from
    a rowbytes*h buffer — heap overread (round-3 review finding). Expanded
    decode must match cv2's."""
    h, w = 10, 24
    lab = ((np.arange(h * w).reshape(h, w) % 3) == 0).astype(np.uint8) * 255
    p = str(tmp_path / "bilevel.png")
    assert cv2.imwrite(p, lab, [cv2.IMWRITE_PNG_BILEVEL, 1])
    ref = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    assert ref is not None and ref.dtype == np.uint8
    out = native_loader.load_label(p, w, h)
    assert out is not None
    np.testing.assert_array_equal(out, ref)


def test_load_rgb_batch_matches_single(tmp_path):
    rng = np.random.default_rng(0)
    h, w, n = 8, 10, 7
    paths = []
    for i in range(n):
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        p = str(tmp_path / f"f{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    batch, status = native_loader.load_rgb_batch(paths, w, h)
    assert (status == 0).all()
    for i, p in enumerate(paths):
        single = native_loader.load_rgb(p, w, h)
        np.testing.assert_array_equal(batch[i], single)


def test_load_rgb_batch_reports_failures(tmp_path):
    h, w = 8, 10
    img = np.zeros((h, w, 3), np.uint8)
    ok = str(tmp_path / "ok.png")
    cv2.imwrite(ok, img)
    batch, status = native_loader.load_rgb_batch(
        [ok, str(tmp_path / "missing.png"), ok], w, h)
    assert status[0] == 0 and status[2] == 0
    assert status[1] != 0
