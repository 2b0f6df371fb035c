"""roi_align_1x1 vs an independent NumPy oracle of torchvision's algorithm.

The oracle follows the documented RoIAlign algorithm (Mask R-CNN paper +
torchvision docs): aligned=True offset, adaptive ceil() sampling grid,
bilinear interpolation with border clamping and the outside-[-1,size] rule.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipself_tpu.ops.mask_pool import mask_pool
from clipself_tpu.ops.roi_align import denormalize_boxes, roi_align_1x1


def _bilinear(feat, y, x):
    """feat: [H, W, C]; single point bilinear with torchvision rules."""
    h, w, _ = feat.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return 0.0
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low = int(np.floor(y))
    x_low = int(np.floor(x))
    if y_low >= h - 1:
        y_low = y_high = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_low = x_high = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    return (
        hy * hx * feat[y_low, x_low]
        + hy * lx * feat[y_low, x_high]
        + ly * hx * feat[y_high, x_low]
        + ly * lx * feat[y_high, x_high]
    )


def oracle_roi_align_1x1(feat, boxes):
    """feat: [H, W, C]; boxes: [N, 4] xyxy in feature coords; aligned=True."""
    out = []
    for x0, y0, x1, y1 in boxes:
        sx0, sy0 = x0 - 0.5, y0 - 0.5
        roi_w = x1 - x0
        roi_h = y1 - y0
        # torchvision aligned=True: NO clamp — degenerate rois run zero
        # sampling iterations and output exactly 0 (count is clamped, not
        # the grid): pytorch/vision roi_align kernel, sampling_ratio <= 0
        gh = int(np.ceil(roi_h))
        gw = int(np.ceil(roi_w))
        acc = np.zeros(feat.shape[-1], np.float32)
        for iy in range(gh):
            yy = sy0 + (iy + 0.5) * roi_h / gh
            for ix in range(gw):
                xx = sx0 + (ix + 0.5) * roi_w / gw
                acc = acc + _bilinear(feat, yy, xx)
        out.append(acc / max(gh * gw, 1))
    return np.stack(out)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roi_align_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    h, w, c = 16, 16, 8
    feat = rng.normal(size=(h, w, c)).astype(np.float32)
    n = 12
    x0 = rng.uniform(0, w - 1, n)
    y0 = rng.uniform(0, h - 1, n)
    x1 = x0 + rng.uniform(0.1, w - x0)
    y1 = y0 + rng.uniform(0.1, h - y0)
    boxes = np.stack([x0, y0, x1, y1], axis=-1).astype(np.float32)

    ours = np.asarray(roi_align_1x1(feat[None], boxes[None]))[0]
    ref = oracle_roi_align_1x1(feat, boxes)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_degenerate_and_full_boxes():
    rng = np.random.default_rng(3)
    h, w, c = 8, 8, 4
    feat = rng.normal(size=(h, w, c)).astype(np.float32)
    boxes = np.array(
        [
            [0.0, 0.0, 8.0, 8.0],  # full image
            [3.0, 3.0, 3.0, 3.0],  # zero-size box
            [7.5, 7.5, 8.0, 8.0],  # touching bottom-right corner
            [0.0, 0.0, 0.4, 0.4],  # tiny top-left
        ],
        dtype=np.float32,
    )
    ours = np.asarray(roi_align_1x1(feat[None], boxes[None]))[0]
    ref = oracle_roi_align_1x1(feat, boxes)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_denormalize_boxes():
    nb = jnp.asarray([[0.0, 0.0, 1.0, 0.5]])
    db = denormalize_boxes(nb, feat_h=64, feat_w=32)
    np.testing.assert_allclose(np.asarray(db), [[0.0, 0.0, 32.0, 32.0]])


def test_roi_align_jit_and_grad():
    rng = np.random.default_rng(4)
    feat = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    boxes = jnp.asarray(
        rng.uniform(1, 6, size=(2, 5, 4)).astype(np.float32)
    ).sort(axis=-1)

    f = jax.jit(lambda ft: roi_align_1x1(ft, boxes).sum())
    g = jax.grad(lambda ft: roi_align_1x1(ft, boxes).sum())(feat)
    assert np.isfinite(float(f(feat)))
    assert g.shape == feat.shape
    assert np.isfinite(np.asarray(g)).all()


def test_mask_pool():
    rng = np.random.default_rng(5)
    feat = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    masks = np.zeros((1, 2, 4, 4), np.float32)
    masks[0, 0, :2, :2] = 1.0  # top-left 2x2
    # second mask left empty (padding)
    out = np.asarray(mask_pool(jnp.asarray(feat), jnp.asarray(masks)))
    expected = feat[0, :2, :2].reshape(-1, 3).mean(0)
    np.testing.assert_allclose(out[0, 0], expected, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[0, 1], 0.0, atol=1e-6)


# ---------------------------------------------------------------------------
# Analytic oracles — closed forms a correct aligned bilinear RoI-align MUST
# produce, independent of any reimplementation of torchvision:
#   - constant feature maps pool to the constant
#   - for a LINEAR field f[i, j] = a*i + b*j + c, bilinear interpolation is
#     exact, so each bin's adaptive-sample mean equals the field at the bin
#     centroid: f(y0 + (oy+0.5)*bh - 0.5, x0 + (ox+0.5)*bw - 0.5) in box
#     coordinates (the -0.5 is the aligned offset), provided every sample
#     point stays inside [0, H-1] x [0, W-1] (no border clamping)


def _linear_map(h, w, a, b, c):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    return (a * ys + b * xs + c)[None, :, :, None]  # [1, H, W, 1]


def test_roi_align_1x1_constant_and_linear_closed_form():
    import jax.numpy as jnp

    from clipself_tpu.ops.roi_align import roi_align_1x1

    h = w = 16
    a, b, c = 0.7, -0.3, 2.0
    feats = np.concatenate(
        [np.full((1, h, w, 1), 5.0, np.float32), _linear_map(h, w, a, b, c)], axis=-1
    )
    # boxes well inside the map (in feature coords), incl. fractional corners
    boxes = np.asarray([[
        [2.0, 3.0, 9.0, 12.0],
        [1.25, 1.75, 13.5, 6.25],
        [4.4, 8.1, 5.9, 9.3],     # sub-2-texel box
        [6.5, 2.5, 8.5, 4.5],     # corners on texel centers
    ]], np.float32)
    got = np.asarray(roi_align_1x1(jnp.asarray(feats), jnp.asarray(boxes)))[0]
    for i, (x0, y0, x1, y1) in enumerate(boxes[0]):
        cy = (y0 + y1) / 2.0 - 0.5
        cx = (x0 + x1) / 2.0 - 0.5
        np.testing.assert_allclose(got[i, 0], 5.0, rtol=1e-5)
        np.testing.assert_allclose(got[i, 1], a * cy + b * cx + c, rtol=1e-5)

    # degenerate (zero-width) roi: the torchvision kernel runs ZERO samples
    # and divides by max(count, 1) -> exactly 0 (not the field value)
    degen = np.asarray([[[3.0, 3.0, 3.0, 9.0]]], np.float32)
    got_d = np.asarray(roi_align_1x1(jnp.asarray(feats), jnp.asarray(degen)))[0, 0]
    np.testing.assert_allclose(got_d, 0.0, atol=1e-7)


def test_roi_align_nxn_linear_closed_form():
    import jax.numpy as jnp

    from clipself_tpu.ops.roi_align import roi_align_nxn

    h = w = 20
    a, b, c = -0.45, 1.2, 0.5
    feats = _linear_map(h, w, a, b, c)
    boxes = np.asarray([[[2.5, 4.0, 14.5, 16.0], [1.0, 1.0, 18.0, 7.5]]], np.float32)
    oh = ow = 3
    got = np.asarray(
        roi_align_nxn(jnp.asarray(feats), jnp.asarray(boxes), (oh, ow))
    )[0, :, :, :, 0]
    for m, (x0, y0, x1, y1) in enumerate(boxes[0]):
        bh = (y1 - y0) / oh
        bw = (x1 - x0) / ow
        for oy in range(oh):
            for ox in range(ow):
                cy = y0 - 0.5 + (oy + 0.5) * bh
                cx = x0 - 0.5 + (ox + 0.5) * bw
                np.testing.assert_allclose(
                    got[m, oy, ox], a * cy + b * cx + c, rtol=1e-5
                )


def test_roi_align_texel_center_box_identity():
    """A box whose aligned corners land exactly on texel centers with one
    sample per bin reads the texel values verbatim: box (x0+0.5, y0+0.5,
    x0+1.5, y0+1.5) in feature coords has aligned extent exactly 1 texel
    starting at integer (y0, x0) -> single sample at the bin center = the
    texel midpoint of a 2x2 patch... the 1-texel case reduces to the value
    at (y0+0.5-0.5+0.5, .) = (y0+0.5): the midpoint between rows y0 and
    y0+1. Use instead a 2-texel box whose samples hit integer coordinates:
    box (x0+0.5, y0+0.5, x0+2.5, y0+2.5) with output 2x2 samples AT the
    texel grid -> returns the 2x2 texel block exactly."""
    import jax.numpy as jnp

    from clipself_tpu.ops.roi_align import roi_align_nxn

    rng = np.random.default_rng(9)
    feats = rng.normal(size=(1, 12, 12, 3)).astype(np.float32)
    y0, x0 = 4, 6
    boxes = np.asarray([[[x0 + 0.5, y0 + 0.5, x0 + 2.5, y0 + 2.5]]], np.float32)
    got = np.asarray(
        roi_align_nxn(jnp.asarray(feats), jnp.asarray(boxes), (2, 2))
    )[0, 0]
    # aligned box = [y0, y0+2] x [x0, x0+2]; each 1x1 bin's single sample
    # (ceil(2/2)=1 per axis) sits at the bin center (y0+0.5, ...): bilinear
    # midpoint of a 2x2 texel block
    want = np.zeros((2, 2, 3), np.float32)
    for oy in range(2):
        for ox in range(2):
            blk = feats[0, y0 + oy : y0 + oy + 2, x0 + ox : x0 + ox + 2]
            want[oy, ox] = blk.mean(axis=(0, 1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
