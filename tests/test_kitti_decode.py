"""KITTI 16-bit flow-PNG decoder on real bytes.

The committed fixture is a format-exact KITTI ground-truth file
(16-bit RGB, color type 2, mixed None/Up filters; encoding per
/root/reference/evaluation/utils/kitti.hh:9-23: R = u*64 + 2^15,
G = v*64 + 2^15, B = valid) so evaluation/flow_eval.py's
dependency-free reader is exercised in CI, not only on datasets that
are never mounted here."""

from pathlib import Path

import numpy as np

import sys
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from evaluation.flow_eval import decode_kitti_flow, read_png16

FIX = Path(__file__).parent / "fixtures"


def test_read_png16_kitti_fixture():
    png = read_png16(str(FIX / "kitti_flow_12x16.png"))
    assert png.shape == (12, 16, 3) and png.dtype == np.uint16
    u, v, valid = decode_kitti_flow(png)
    gt = np.load(FIX / "kitti_flow_12x16_gt.npz")
    np.testing.assert_allclose(u, gt["u"], atol=1.0 / 64.0)
    np.testing.assert_allclose(v, gt["v"], atol=1.0 / 64.0)
    np.testing.assert_array_equal(valid, gt["valid"])
    # the KITTI quantisation step is exactly 1/64 px
    assert np.abs(u - gt["u"]).max() < 1e-5
