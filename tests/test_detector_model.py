"""End-to-end FViT detector: init, jitted loss, jitted prediction (tiny cfg)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipself_tpu.core.config import config_from_dict
from clipself_tpu.detector.config import AnchorCfg, FViTConfig, ProposalCfg, RcnnTestCfg, SampleCfg
from clipself_tpu.detector.fvit import FViTDetector, backbone_taps
from clipself_tpu.models.factory import create_model

TINY_CLIP = config_from_dict(
    {
        "embed_dim": 32,
        "vision_cfg": {
            "image_size": 32,
            "layers": 4,
            "width": 64,
            "head_width": 32,
            "patch_size": 8,
            "mlp_ratio": 2.0,
            "eva_model_name": "tiny-det-test",
            "rope": True,
            "naiveswiglu": True,
            "subln": True,
        },
        "text_cfg": {
            "context_length": 16,
            "vocab_size": 512,
            "width": 32,
            "heads": 2,
            "layers": 1,
        },
    },
    name="tiny-det",
)

DET_CFG = FViTConfig(
    clip_model="tiny-det",
    out_indices=(0, 1, 2, 3),
    backbone_width=64,
    embed_dim=32,
    patch_size=8,
    fpn_channels=32,
    anchors=AnchorCfg(strides=(2, 4, 8, 16, 32)),
    num_classes=6,
    num_shared_convs=1,
    num_shared_fcs=1,
    fc_out_channels=32,
    train_proposals=ProposalCfg(nms_pre=128, max_per_img=32),
    test_proposals=ProposalCfg(nms_pre=128, max_per_img=32),
    rcnn_sample=SampleCfg(num=16, pos_fraction=0.25, add_gt_as_proposals=True),
    rcnn_test=RcnnTestCfg(max_per_img=8),
    max_gt=5,
    image_size=64,
)


@pytest.fixture(scope="module")
def setup():
    clip_model, clip_params = create_model(TINY_CLIP, dtype=jnp.float32)
    det = FViTDetector(DET_CFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    taps, dense = clip_model.apply(
        {"params": clip_params}, images, DET_CFG.out_indices, True,
        method="visual_taps",
    )
    class_embed = jnp.asarray(rng.normal(size=(DET_CFG.num_classes + 1, 32)), jnp.float32)
    class_embed = class_embed / jnp.linalg.norm(class_embed, axis=-1, keepdims=True)
    rois = jnp.asarray([[[4.0, 4.0, 30.0, 30.0]], [[8.0, 8.0, 40.0, 50.0]]])
    det_params = det.init(jax.random.PRNGKey(1), taps, rois, class_embed)["params"]
    return clip_model, clip_params, det, det_params, taps, dense, class_embed


def _gt(b=2, g=5):
    rng = np.random.default_rng(3)
    xy = rng.uniform(0, 30, size=(b, g, 2)).astype(np.float32)
    wh = rng.uniform(8, 30, size=(b, g, 2)).astype(np.float32)
    boxes = np.concatenate([xy, np.clip(xy + wh, None, 64)], axis=-1)
    labels = rng.integers(0, 6, size=(b, g)).astype(np.int32)
    valid = np.ones((b, g), bool)
    valid[:, -1] = False
    return jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid)


def test_taps_shapes(setup):
    _, _, _, _, taps, dense, _ = setup
    assert len(taps) == 4
    assert all(t.shape == (2, 8, 8, 64) for t in taps)
    assert dense.shape == (2, 8, 8, 32)
    norms = np.linalg.norm(np.asarray(dense), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_detector_loss_jit(setup):
    _, _, det, det_params, taps, _, class_embed = setup
    gt_boxes, gt_labels, gt_valid = _gt()
    cw = jnp.asarray([1, 1, 0, 1, 0, 1, 0.6], jnp.float32)  # novel classes zeroed

    @jax.jit
    def loss_fn(p, key):
        return det.apply(
            {"params": p}, taps, gt_boxes, gt_labels, gt_valid, key, class_embed,
            cw, method="loss",
        )

    total, metrics = loss_fn(det_params, jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    for k in ("rpn_loss_cls", "rpn_loss_bbox", "loss_cls", "loss_bbox"):
        assert np.isfinite(float(metrics[k])), k
    # grads flow through the head but not into any frozen input
    g = jax.grad(lambda p: loss_fn(p, jax.random.PRNGKey(0))[0])(det_params)
    gnorm = float(
        sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(g)) ** 0.5
    )
    assert gnorm > 0 and np.isfinite(gnorm)


def test_detector_predict_jit(setup):
    _, _, det, det_params, taps, dense, class_embed = setup
    base_mask = jnp.asarray([True, True, False, True, False, True, True])

    @jax.jit
    def predict(p):
        return det.apply(
            {"params": p}, taps, dense, class_embed, base_mask, method="predict"
        )

    boxes, scores, labels = predict(det_params)
    assert boxes.shape == (2, 8, 4)
    assert scores.shape == (2, 8)
    assert labels.shape == (2, 8)
    s = np.asarray(scores)
    valid = s > -1e9
    assert np.all((s[valid] >= 0) & (s[valid] <= 1))
    lab = np.asarray(labels)
    assert np.all((lab[valid] >= 0) & (lab[valid] < 6))
    b = np.asarray(boxes)[valid]
    assert np.all(b[:, 2] >= b[:, 0]) and np.all(b[:, 3] >= b[:, 1])
    assert np.all(b >= 0) and np.all(b <= 64)


def test_detector_mask_branch(setup):
    clip_model, clip_params, _, _, taps, dense, class_embed = setup
    import dataclasses

    cfg = dataclasses.replace(DET_CFG, with_mask=True, mask_convs=1, mask_channels=16, mask_roi_size=4)
    det = FViTDetector(cfg, dtype=jnp.float32)
    rois = jnp.asarray([[[4.0, 4.0, 30.0, 30.0]], [[8.0, 8.0, 40.0, 50.0]]])
    params = det.init(jax.random.PRNGKey(2), taps, rois, class_embed)["params"]
    gt_boxes, gt_labels, gt_valid = _gt()
    gt_masks = jnp.asarray(
        (np.random.default_rng(5).uniform(size=(2, 5, 16, 16)) > 0.5), jnp.float32
    )
    total, metrics = jax.jit(
        lambda p, k: det.apply(
            {"params": p}, taps, gt_boxes, gt_labels, gt_valid, k, class_embed,
            None, gt_masks, method="loss",
        )
    )(params, jax.random.PRNGKey(0))
    assert np.isfinite(float(total)) and np.isfinite(float(metrics["loss_mask"]))
    out = jax.jit(
        lambda p: det.apply(
            {"params": p}, taps, dense, class_embed,
            jnp.ones(7, bool), method="predict",
        )
    )(params)
    assert len(out) == 4
    probs = np.asarray(out[3])
    assert probs.shape == (2, 8, 8, 8)
    assert np.all((probs >= 0) & (probs <= 1))


def test_mask_head_label_gather_exact():
    """_ClassConv1x1's label-gather path == full per-class conv + channel
    select, bit-exact in f32 (the LVIS OOM fix must not change values)."""
    from clipself_tpu.detector.roi_head import _ClassConv1x1

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(6, 8, 8, 16)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 11, size=(6,)), jnp.int32)
    mod = _ClassConv1x1(11, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    full = mod.apply({"params": params}, x)  # [6, 8, 8, 11]
    gathered = mod.apply({"params": params}, x, labels)  # [6, 8, 8]
    want = np.take_along_axis(
        np.asarray(full), np.asarray(labels)[:, None, None, None], axis=-1
    )[..., 0]
    # same multiplies/adds; XLA may order the 16-term accumulation
    # differently between the two einsum forms, so ~1 ULP rather than bits
    np.testing.assert_allclose(np.asarray(gathered), want, rtol=1e-6, atol=1e-6)


def test_detector_step_data_parallel_matches_single_device(setup):
    """One detector train step on an 8-device `data` mesh == the unsharded
    step (the batch-sharding psum is the detector's DDP equivalent; the
    distill step has the same guarantee in test_multichip_dryrun)."""
    from jax.sharding import Mesh
    from clipself_tpu.detector.train import (
        DetTrainState, build_det_optimizer, make_det_train_step,
    )
    from clipself_tpu.parallel.mesh import shard_batch

    clip_model, clip_params, det, det_params, taps, dense, class_embed = setup
    tx = build_det_optimizer()
    rng = np.random.default_rng(11)
    b = 8
    images = jnp.asarray(rng.normal(size=(b, 64, 64, 3)), jnp.float32)
    xy = rng.uniform(0, 30, size=(b, 5, 2)).astype(np.float32)
    wh = rng.uniform(8, 30, size=(b, 5, 2)).astype(np.float32)
    batch = {
        "images": images,
        "gt_boxes": jnp.asarray(np.concatenate([xy, np.clip(xy + wh, None, 64)], -1)),
        "gt_labels": jnp.asarray(rng.integers(0, 6, size=(b, 5)), jnp.int32),
        "gt_valid": jnp.ones((b, 5), bool),
    }
    key = jax.random.PRNGKey(4)

    # the step donates its state — give each run its own copy of the params
    state0 = DetTrainState.create(jax.tree.map(jnp.copy, det_params), tx)
    step1 = make_det_train_step(det, clip_model, tx, DET_CFG, class_embed, None, mesh=None)
    _, m1 = step1(state0, clip_params, batch, key)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    stepN = make_det_train_step(det, clip_model, tx, DET_CFG, class_embed, None, mesh=mesh)
    stateM = DetTrainState.create(jax.tree.map(jnp.copy, det_params), tx)
    _, mN = stepN(stateM, clip_params, shard_batch(mesh, batch), key)
    np.testing.assert_allclose(
        float(mN["loss"]), float(m1["loss"]), rtol=2e-6, atol=2e-6
    )


def test_backbone_taps_helper(setup):
    clip_model, clip_params, _, _, _, _, _ = setup
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    taps, dense = backbone_taps(clip_model, clip_params, images, DET_CFG, True)
    assert len(taps) == 4 and dense is not None


def test_mask_loss_subset_equals_full(setup):
    """The positives-first fixed-subset mask loss (fvit._mask_loss, the
    LVIS OOM fix) EQUALS the full-R-roi formulation whenever the sampler
    cap holds — pinned on a scattered-positives batch and on a batch with
    positives exactly at the cap, not argued from first principles."""
    import dataclasses

    from clipself_tpu.detector.roi_head import RoITargets, multilevel_roi_align
    import optax

    clip_model, clip_params, _, _, taps, dense, class_embed = setup
    cfg = dataclasses.replace(
        DET_CFG, with_mask=True, mask_convs=1, mask_channels=16, mask_roi_size=4
    )
    det = FViTDetector(cfg, dtype=jnp.float32)
    rois_init = jnp.asarray([[[4.0, 4.0, 30.0, 30.0]], [[8.0, 8.0, 40.0, 50.0]]])
    params = det.init(jax.random.PRNGKey(2), taps, rois_init, class_embed)["params"]
    feats, _, _ = det.apply({"params": params}, taps, method="features")

    rng = np.random.default_rng(9)
    b, r, g = 2, cfg.rcnn_sample.num, cfg.max_gt
    mr = int(cfg.rcnn_sample.num * cfg.rcnn_sample.pos_fraction)  # 4
    xy = rng.uniform(0, 30, size=(b, r, 2)).astype(np.float32)
    wh = rng.uniform(6, 30, size=(b, r, 2)).astype(np.float32)
    rois = jnp.asarray(np.concatenate([xy, np.clip(xy + wh, None, 64)], -1))
    # image 0: 2 positives scattered deep in the roi list (stresses the
    # stable argsort reorder); image 1: exactly mr positives (the cap)
    pos = np.zeros((b, r), bool)
    pos[0, [7, 12]] = True
    pos[1, [3, 5, 9, 15]] = True
    assert pos[1].sum() == mr
    labels = np.full((b, r), cfg.num_classes, np.int32)  # background
    labels[pos] = rng.integers(0, cfg.num_classes, size=int(pos.sum()))
    tgt = RoITargets(
        rois=rois,
        labels=jnp.asarray(labels),
        chosen=jnp.asarray(pos),
        pos=jnp.asarray(pos),
        reg_targets=jnp.zeros((b, r, 4), jnp.float32),
        gt_idx=jnp.asarray(rng.integers(0, g, size=(b, r)), jnp.int32),
    )
    gt_masks = jnp.asarray(
        (rng.uniform(size=(b, g, 16, 16)) > 0.5), jnp.float32
    )

    subset = det.apply({"params": params}, feats, tgt, gt_masks, method="_mask_loss")

    def full_formulation(mdl, feats, tgt, gt_masks):
        """All-R-roi mask loss: head on every sampled roi, masked mean over
        positives — the formulation the subset claims to preserve."""
        c = mdl.cfg
        from clipself_tpu.ops.roi_align import roi_align_nxn

        b, r = tgt.rois.shape[:2]
        pooled = multilevel_roi_align(
            feats[:4], tgt.rois, c.anchors.strides[:4], c.mask_roi_size,
            c.finest_scale,
        )
        lab = jnp.clip(tgt.labels.reshape(-1), 0, c.num_classes - 1)
        ml = mdl.mask_head(pooled.reshape((b * r,) + pooled.shape[2:]), lab)
        out = c.mask_roi_size * 2
        mstride = float(c.image_size) / float(gt_masks.shape[2])
        maps = jnp.moveaxis(gt_masks.astype(jnp.float32), 1, -1)
        tgt_masks = roi_align_nxn(maps, tgt.rois / mstride, (out, out))
        onehot = jax.nn.one_hot(tgt.gt_idx, gt_masks.shape[1])
        tgt_sel = jnp.einsum("brxyg,brg->brxy", tgt_masks, onehot)
        tgt_sel = (tgt_sel > 0.5).astype(jnp.float32).reshape(b * r, out, out)
        bce = optax.sigmoid_binary_cross_entropy(ml, tgt_sel)
        posf = tgt.pos.reshape(-1)
        per_roi = bce.mean(axis=(1, 2))
        return (per_roi * posf).sum() / jnp.maximum(posf.sum(), 1.0)

    full = det.apply(
        {"params": params}, feats, tgt, gt_masks, method=full_formulation
    )
    # identical per-roi math on the same rois; only batch tiling differs
    np.testing.assert_allclose(float(subset), float(full), rtol=1e-6, atol=1e-7)
    assert float(subset) > 0.0
