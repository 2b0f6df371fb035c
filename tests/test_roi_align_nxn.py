"""NxN roi_align vs NumPy oracle with per-bin adaptive sampling."""

import numpy as np
import pytest

from clipself_tpu.ops.roi_align import roi_align_nxn
from tests.test_roi_align import _bilinear


def oracle_roi_align(feat, boxes, oh, ow):
    out = np.zeros((len(boxes), oh, ow, feat.shape[-1]), np.float32)
    for n, (x0, y0, x1, y1) in enumerate(boxes):
        sx0, sy0 = x0 - 0.5, y0 - 0.5
        roi_w, roi_h = x1 - x0, y1 - y0
        bin_h, bin_w = roi_h / oh, roi_w / ow
        gh = max(int(np.ceil(bin_h)), 1)
        gw = max(int(np.ceil(bin_w)), 1)
        for by in range(oh):
            for bx in range(ow):
                acc = 0.0
                for iy in range(gh):
                    yy = sy0 + by * bin_h + (iy + 0.5) * bin_h / gh
                    for ix in range(gw):
                        xx = sx0 + bx * bin_w + (ix + 0.5) * bin_w / gw
                        acc = acc + _bilinear(feat, yy, xx)
                out[n, by, bx] = acc / max(gh * gw, 1)
    return out


@pytest.mark.parametrize("out_size", [(1, 1), (2, 2), (7, 7)])
def test_roi_align_nxn_matches_oracle(out_size):
    rng = np.random.default_rng(0)
    h, w, c = 16, 16, 4
    feat = rng.normal(size=(h, w, c)).astype(np.float32)
    n = 6
    x0 = rng.uniform(0, w - 2, n)
    y0 = rng.uniform(0, h - 2, n)
    x1 = x0 + rng.uniform(0.5, w - x0)
    y1 = y0 + rng.uniform(0.5, h - y0)
    boxes = np.stack([x0, y0, x1, y1], -1).astype(np.float32)

    ours = np.asarray(roi_align_nxn(feat[None], boxes[None], out_size))[0]
    ref = oracle_roi_align(feat, boxes, *out_size)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_nxn_1x1_consistency():
    from clipself_tpu.ops.roi_align import roi_align_1x1

    rng = np.random.default_rng(1)
    feat = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    boxes = np.asarray([[[1.0, 1.0, 6.0, 7.0], [0.0, 0.0, 8.0, 8.0]]], np.float32)
    a = np.asarray(roi_align_nxn(feat, boxes, (1, 1)))[:, :, 0, 0, :]
    b = np.asarray(roi_align_1x1(feat, boxes))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
