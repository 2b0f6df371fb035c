"""resize_2d parity with torch.nn.functional.interpolate (align_corners=False)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from clipself_tpu.ops.interpolate import resize_2d, resize_weight_matrix


@pytest.mark.parametrize("method", ["bicubic", "bilinear"])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((14, 14), (64, 64)), ((14, 14), (7, 7)), ((16, 16), (56, 56)), ((5, 9), (13, 4))],
)
def test_resize_matches_torch(method, in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, *in_hw)).astype(np.float32)
    ours = np.asarray(resize_2d(x, out_hw, method=method))
    theirs = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode=method, align_corners=False
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_identity():
    w = resize_weight_matrix(32, 32)
    np.testing.assert_array_equal(w, np.eye(32, dtype=np.float32))


def test_rows_sum_to_one():
    for method in ("bicubic", "bilinear"):
        w = resize_weight_matrix(14, 64, method)
        np.testing.assert_allclose(w.sum(-1), np.ones(64), rtol=1e-6)
