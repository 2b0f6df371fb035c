"""Zero-shot region classification: per-class mean accuracy on COCO-Panoptic.

Reference semantics (`src/training/zero_shot.py:11-193`): for every panoptic
val image, classify (a) RoI features, (b) mask-pooled features, (c) crop
features against a fixed text-embedding matrix; report per-class mean top-1 /
top-5 accuracy split by thing/stuff.

TPU re-design: the reference runs batch-size 1 with ragged box lists
(`data.py:484`); here batches are fixed-shape padded and any batch size
works, with validity masks carried to the metric stage. Per-device results
are gathered host-side (multihost gather hook for multi-process runs).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from clipself_tpu.core import knobs


def _topk_correct(logits: np.ndarray, labels: np.ndarray, k: int = 5) -> np.ndarray:
    """[N, K] logits, [N] labels -> [N, k] bool matrix of top-k hits
    (column 0 is the argmax, matching the reference's correct matrix)."""
    topk = np.argsort(-logits, axis=-1)[:, :k]
    return topk == labels[:, None]


def macc_with_is_thing(
    correct: np.ndarray, is_thing: np.ndarray, labels: np.ndarray, prefix: str
) -> dict:
    """Per-class mean accuracy, thing/stuff x top1/top5
    (reference `macc_with_is_thing`, `zero_shot.py:140-174`)."""

    def _macc(corrects: np.ndarray, cls: np.ndarray) -> float:
        if cls.size == 0:
            return float("nan")
        accs = []
        for lb in range(int(cls.min()), int(cls.max()) + 1):
            sel = corrects[cls == lb]
            if sel.shape[0] == 0:
                continue
            accs.append(np.float16(sel.mean()).item())
        return float(sum(accs) / max(len(accs), 1))

    results = {}
    for group, sel in (("thing", is_thing > 0), ("stuff", is_thing < 1)):
        c = correct[sel]
        lb = labels[sel].astype(np.int64)
        results[f"{prefix}.{group}.macc1"] = _macc(c[:, 0], lb)
        results[f"{prefix}.{group}.macc5"] = _macc(c.sum(-1) > 0, lb)
    return results


@functools.lru_cache(maxsize=8)
def _make_batch_features(model, extract_type: str, image_ave_pool: bool):
    """Jitted per-batch feature+logit computation.

    Cached on (model, flags) — flax Modules are frozen dataclasses, so the
    eval-every-epoch loop in `train/main.py` reuses one traced executable
    instead of re-tracing each epoch. The text-embedding matrix is an
    argument (not a closure capture) for the same reason.

    RoI and mask-pooled features come from ONE shared dense pass
    (`CLIP.encode_rois_and_masks`); the reference pays two full forwards
    per image here (`zero_shot.py:60-86`).
    """

    @jax.jit
    def batch_features(params, emb_dev, images, boxes4, crops, masks):
        # reference zero_shot.py:74-76: mask-attention pooling when v1
        rois, maskpool = model.apply(
            {"params": params}, images, boxes4, masks, True, extract_type,
            extract_type == "v1",
            method="encode_rois_and_masks",
        )
        b, m = crops.shape[:2]
        crop_flat = crops.reshape((b * m,) + crops.shape[2:])
        if image_ave_pool:
            dense = model.apply({"params": params}, crop_flat, True, True, method="encode_dense")
            cf = dense.mean(axis=(1, 2))
            cf = cf / (jnp.linalg.norm(cf.astype(jnp.float32), axis=-1, keepdims=True) + 1e-12).astype(cf.dtype)
        else:
            cf = model.apply({"params": params}, crop_flat, True, method="encode_image")
        crop_feats = cf.reshape(b, m, -1)
        return (
            (rois.astype(jnp.float32) @ emb_dev.T),
            (crop_feats.astype(jnp.float32) @ emb_dev.T),
            (maskpool.astype(jnp.float32) @ emb_dev.T),
        )

    return batch_features


def evaluate_zero_shot(
    model,
    params,
    dataloader,
    embeddings: np.ndarray,
    mesh=None,
    image_ave_pool: bool = False,
    extract_type: str = "v2",
    gather_fn=None,
    progress: bool = False,
    ann_bucket: Optional[int] = None,
) -> dict:
    """Run the full evaluator.

    Args:
      dataloader: yields dicts with images/boxes[...,8]/crops/gt_masks
        (COCOPanopticEvalDataset batches).
      embeddings: [num_classes, C] text classifier (will be L2-normalized).
      gather_fn: optional cross-process gather (multihost); identity default.
      ann_bucket: ann-axis bucket width (None -> the `eval_ann_bucket` knob,
        default 25; 0 disables; forced off in multi-process runs).
    """
    # copy before normalizing — np.asarray aliases a float32 input and an
    # in-place divide would mutate the caller's (often dataset-owned) matrix
    emb = np.array(embeddings, np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12
    emb_dev = jnp.asarray(emb)

    if mesh is not None:
        from clipself_tpu.parallel.mesh import put_batch_array

        to_device = functools.partial(put_batch_array, mesh)
    else:
        to_device = jnp.asarray

    feature_fn = _make_batch_features(model, extract_type, image_ave_pool)

    def batch_features(params, images, boxes4, crops, masks):
        return feature_fn(params, emb_dev, images, boxes4, crops, masks)

    acc = {k: [] for k in ("rois", "crops", "maskpool")}
    all_labels, all_is_thing = [], []

    it = dataloader
    if progress:
        from tqdm import tqdm

        it = tqdm(dataloader)
    # Ann-axis bucketing: the dataset pads every image to max_anns (<=100)
    # slots, but COCO-Panoptic val images average ~13 segments, and the
    # dominant eval cost (the per-ann crop encode) is linear in the padded
    # width. Each batch is sliced to the smallest multiple of `bucket`
    # covering its highest valid row (exact for any pad layout — rows past
    # the last valid one are pure padding), so the epoch runs a handful of
    # static shapes instead of one maximal one. 0 disables.
    bucket = int(knobs.get("eval_ann_bucket")) if ann_bucket is None else int(ann_bucket)
    # The width is computed from process-LOCAL batch contents; in a
    # multi-process run different hosts would trace differently-shaped SPMD
    # programs for the same step and deadlock. Bucket only when single-process
    # (multihost eval keeps the static max-ann width).
    if jax.process_count() > 1:
        bucket = 0

    for batch in it:
        boxes = np.asarray(batch["boxes"])
        valid = boxes[..., 5].reshape(-1) > 0.5
        if valid.sum() == 0:
            # fully-padded batch: nothing to score, skip before paying the
            # device encode (and a possible extra compile at a new width)
            continue
        images = to_device(batch["images"])
        crops, masks = batch["crops"], batch["gt_masks"]
        if bucket > 0 and boxes.shape[1] > bucket:
            rows = np.nonzero(boxes[..., 5] > 0.5)[-1]
            hi = int(rows.max()) + 1 if rows.size else 1
            width = min(-(-hi // bucket) * bucket, boxes.shape[1])
            if width < boxes.shape[1]:
                boxes = boxes[:, :width]
                crops = crops[:, :width]
                masks = masks[:, :width]
        logits = batch_features(
            params,
            images,
            to_device(boxes[..., :4]),
            to_device(crops),
            to_device(masks),
        )
        valid = boxes[..., 5].reshape(-1) > 0.5
        labels = boxes[..., 4].reshape(-1)[valid].astype(np.int64)
        for key, lg in zip(("rois", "crops", "maskpool"), logits):
            lg = np.asarray(lg).reshape(-1, emb.shape[0])[valid]
            acc[key].append(_topk_correct(lg, labels))
        all_labels.append(labels)
        all_is_thing.append(boxes[..., 7].reshape(-1)[valid])

    if not all_labels:
        return {}

    correct = {k: np.concatenate(v) for k, v in acc.items()}
    labels = np.concatenate(all_labels)
    is_thing = np.concatenate(all_is_thing)

    if gather_fn is not None:
        correct = {k: gather_fn(v) for k, v in correct.items()}
        labels = gather_fn(labels)
        is_thing = gather_fn(is_thing)

    results = {}
    for key in ("rois", "crops", "maskpool"):
        results.update(macc_with_is_thing(correct[key], is_thing, labels, key))
    return results
