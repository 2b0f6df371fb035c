"""Zero-shot evaluator: fused rois+masks path and end-to-end metrics.

Reference semantics: `src/training/zero_shot.py:11-193` (separate
encode_pseudo_boxes / encode_masks model calls per batch; here both come
from one shared dense pass — `CLIP.encode_rois_and_masks`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipself_tpu.core.config import get_model_config
from clipself_tpu.models.factory import create_model


@pytest.fixture(scope="module")
def eva_setup():
    cfg = get_model_config("EVA02-CLIP-Tiny-Test")
    model, params = create_model(cfg, dtype=jnp.float32, seed=0)
    return cfg, model, params


def _boxes_masks(rng, b, m, gh, gw):
    xy = rng.uniform(0, 0.5, size=(b, m, 2)).astype(np.float32)
    wh = rng.uniform(0.1, 0.5, size=(b, m, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=-1)
    masks = (rng.uniform(size=(b, m, gh, gw)) < 0.3).astype(np.float32)
    masks[:, :, 0, 0] = 1.0  # no all-empty masks
    return jnp.asarray(boxes), jnp.asarray(masks)


def test_encode_rois_and_masks_fused_matches_separate(eva_setup):
    """ONE dense pass must reproduce the two-call composition exactly."""
    cfg, model, params = eva_setup
    s = 32
    gh = gw = s // cfg.vision.patch_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, s, s, 3)).astype(np.float32))
    boxes, masks = _boxes_masks(rng, 2, 3, gh, gw)

    rois_sep = model.apply(
        {"params": params}, images, boxes, True, "v2",
        method="encode_pseudo_boxes",
    )
    masks_sep = model.apply(
        {"params": params}, images, masks, True, False, method="encode_masks"
    )
    rois_f, masks_f = model.apply(
        {"params": params}, images, boxes, masks, True, "v2", False,
        method="encode_rois_and_masks",
    )
    np.testing.assert_allclose(np.asarray(rois_f), np.asarray(rois_sep), atol=1e-6)
    np.testing.assert_allclose(np.asarray(masks_f), np.asarray(masks_sep), atol=1e-6)


def test_encode_rois_and_masks_v1_fallback():
    """v1 (mask-attention) extract type routes to the separate calls and
    still matches them (plain OpenCLIP tower owns the v1 path)."""
    cfg = get_model_config("ViT-Tiny-Test")
    model, params = create_model(cfg, dtype=jnp.float32, seed=0)
    s = 32
    gh = gw = s // cfg.vision.patch_size
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(2, s, s, 3)).astype(np.float32))
    boxes, masks = _boxes_masks(rng, 2, 3, gh, gw)

    rois_sep = model.apply(
        {"params": params}, images, boxes, True, "v1",
        method="encode_pseudo_boxes",
    )
    masks_sep = model.apply(
        {"params": params}, images, masks, True, True, method="encode_masks"
    )
    rois_f, masks_f = model.apply(
        {"params": params}, images, boxes, masks, True, "v1", True,
        method="encode_rois_and_masks",
    )
    np.testing.assert_allclose(np.asarray(rois_f), np.asarray(rois_sep), atol=1e-6)
    np.testing.assert_allclose(np.asarray(masks_f), np.asarray(masks_sep), atol=1e-6)


def test_evaluate_zero_shot_end_to_end(eva_setup):
    """Full evaluator over synthetic padded batches: metric surface complete,
    values finite, repeat call identical (exercises the cached jit)."""
    from clipself_tpu.eval.zero_shot import evaluate_zero_shot

    cfg, model, params = eva_setup
    s = 32
    gh = gw = s // cfg.vision.patch_size
    b, m, n_classes = 2, 4, 7
    rng = np.random.default_rng(2)
    emb = rng.standard_normal((n_classes, cfg.embed_dim)).astype(np.float32)

    def make_batch(i):
        r = np.random.default_rng(10 + i)
        boxes8 = np.zeros((b, m, 8), np.float32)
        xy = r.uniform(0, 0.5, size=(b, m, 2))
        boxes8[..., :2] = xy
        boxes8[..., 2:4] = xy + r.uniform(0.1, 0.5, size=(b, m, 2))
        boxes8[..., 4] = r.integers(0, n_classes, size=(b, m))
        boxes8[..., 5] = (r.uniform(size=(b, m)) > 0.25)  # some padding rows
        boxes8[..., 5][:, 0] = 1.0
        boxes8[..., 7] = r.integers(0, 2, size=(b, m))
        masks = (r.uniform(size=(b, m, gh, gw)) < 0.3).astype(np.float32)
        masks[:, :, 0, 0] = 1.0
        return {
            "images": r.normal(size=(b, s, s, 3)).astype(np.float32),
            "boxes": boxes8,
            "crops": r.normal(size=(b, m, s, s, 3)).astype(np.float32),
            "gt_masks": masks,
        }

    batches = [make_batch(i) for i in range(3)]
    res = evaluate_zero_shot(model, params, batches, emb)
    keys = {
        f"{p}.{g}.macc{k}"
        for p in ("rois", "crops", "maskpool")
        for g in ("thing", "stuff")
        for k in (1, 5)
    }
    assert keys == set(res)
    assert all(np.isfinite(v) for v in res.values())
    res2 = evaluate_zero_shot(model, params, batches, emb)
    assert res == res2


def test_evaluate_zero_shot_ann_bucketing(eva_setup, monkeypatch):
    """Bucketing the padded ann axis must not change any metric: batches
    padded to 12 slots with <=3 valid anns produce identical results with
    bucket=4 (slices to width 4/8) and with bucketing disabled."""
    from clipself_tpu.eval.zero_shot import evaluate_zero_shot

    cfg, model, params = eva_setup
    s = 32
    gh = gw = s // cfg.vision.patch_size
    b, m, n_classes = 2, 12, 7
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((n_classes, cfg.embed_dim)).astype(np.float32)

    def make_batch(i, n_valid):
        r = np.random.default_rng(20 + i)
        boxes8 = np.zeros((b, m, 8), np.float32)
        xy = r.uniform(0, 0.5, size=(b, m, 2))
        boxes8[..., :2] = xy
        boxes8[..., 2:4] = xy + r.uniform(0.1, 0.5, size=(b, m, 2))
        boxes8[..., 4] = r.integers(0, n_classes, size=(b, m))
        boxes8[..., 5] = (np.arange(m) < n_valid)[None, :]
        # a hole: invalidate a middle row (bucketing must still cover row 2)
        if n_valid >= 3:
            boxes8[:, 1, 5] = 0.0
        boxes8[..., 7] = r.integers(0, 2, size=(b, m))
        masks = (r.uniform(size=(b, m, gh, gw)) < 0.3).astype(np.float32)
        masks[:, :, 0, 0] = 1.0
        return {
            "images": r.normal(size=(b, s, s, 3)).astype(np.float32),
            "boxes": boxes8,
            "crops": r.normal(size=(b, m, s, s, 3)).astype(np.float32),
            "gt_masks": masks,
        }

    batches = [make_batch(0, 3), make_batch(1, 2), make_batch(2, 7)]
    monkeypatch.setenv("CLIPSELF_EVAL_ANN_BUCKET", "0")
    res_full = evaluate_zero_shot(model, params, batches, emb)
    monkeypatch.setenv("CLIPSELF_EVAL_ANN_BUCKET", "4")
    res_bucket = evaluate_zero_shot(model, params, batches, emb)
    assert res_full == res_bucket
