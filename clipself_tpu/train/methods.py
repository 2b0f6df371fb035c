"""Training methods (loss functions) as pure jittable functions.

The reference's extension point is a *method object* called per step
(`src/training/clipself.py:7-49`, `src/training/region_clip.py:19-67`). Here
each method is a pure function `(params, teacher_params, batch, model, rng)
-> (loss, metrics)` that the jitted train step differentiates. Ragged
per-image box lists become fixed-shape padded arrays with validity masks —
the TPU-native reformulation of `clipself.py:29-36`.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from clipself_tpu.models.clip import l2_normalize
from clipself_tpu.ops.interpolate import resize_nhwc

# multiscale target sizes per det size (reference clipself.py:17-27)
MULTISCALE_SIZES = {1024: (320, 640, 896, 1024), 896: (336, 448, 672, 896)}


def multiscale_sizes(det_size: int, patch_size: int = 16) -> tuple[int, ...]:
    if det_size in MULTISCALE_SIZES:
        return MULTISCALE_SIZES[det_size]
    # generic ladder for non-reference det sizes (the reference only supports
    # 1024/896 and errors otherwise). Every rung must be a patch multiple or
    # the patchify grid would misalign with the [0,1]-normalized boxes
    def snap(v):
        return max(patch_size, (v // patch_size) * patch_size)

    return tuple(sorted({snap(det_size // 2), snap(det_size * 3 // 4), det_size}))


def resize_images_for_scale(batch: dict, target_size: int) -> dict:
    """Bilinear-resize the full images to `target_size` (a static shape —
    each scale is its own compiled step, replacing the reference's in-graph
    `F.interpolate`). Boxes are normalized so they are scale-invariant."""
    if batch["images"].shape[1] == target_size:
        return batch
    out = dict(batch)
    out["images"] = resize_nhwc(batch["images"], (target_size, target_size), "bilinear")
    return out


def clipself_loss(
    params: Any,
    teacher_params: Any,
    batch: dict,
    model,
    rng: Optional[jax.Array] = None,
    *,
    cosine_weight: float = 1.0,
    extract_type: str = "v2",
) -> tuple[jnp.ndarray, dict]:
    """CLIPSelf distillation step (reference `CLIPSelf.__call__`,
    `clipself.py:7-49`).

    batch:
      images: [B, S, S, 3] full images (already multiscale-resized if enabled)
      boxes:  [B, M, 5] xyxy normalized + valid flag
      crops:  [B, M, s, s, 3] teacher crops (padded rows arbitrary)

    The teacher encodes every padded crop (masked out of the loss); the
    reference's ragged `torch.cat` of valid crops becomes fixed-shape masked
    computation.
    """
    images = batch["images"]
    boxes = batch["boxes"]
    crops = batch["crops"]
    b, m = boxes.shape[:2]
    valid = (boxes[..., 4] > 0.5).reshape(b * m)

    crop_flat = crops.reshape((b * m,) + crops.shape[2:])
    teacher_feats = model.apply(
        {"params": teacher_params}, crop_flat, method="encode_image"
    )
    teacher_feats = jax.lax.stop_gradient(teacher_feats)

    student_feats = model.apply(
        {"params": params}, images, boxes[..., :4],
        False, extract_type, method="encode_pseudo_boxes",
    ).reshape(b * m, -1)

    cos = jnp.sum(
        l2_normalize(student_feats).astype(jnp.float32)
        * l2_normalize(teacher_feats).astype(jnp.float32),
        axis=-1,
    )
    n_valid = jnp.maximum(valid.sum(), 1.0)
    loss = ((1.0 - cos) * valid).sum() / n_valid
    loss = loss * cosine_weight
    return loss, {"loss_cosine": loss, "num_boxes": valid.sum()}


def _fed_class_mask(
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    num_classes: int,
    num_sample: int,
    rng: jax.Array,
) -> jnp.ndarray:
    """Federated-loss class selection as a fixed-shape mask.

    Reference `get_fed_loss_inds` (`region_clip.py:7-16`) takes the appeared
    classes plus a uniform sample (without replacement) of absent classes up
    to `num_sample`. Reformulated jit-friendly: random scores with appeared
    classes pinned to the top, then top-k.
    """
    onehot = jax.nn.one_hot(labels, num_classes) * valid[:, None]
    appeared = onehot.sum(0) > 0  # [C]
    noise = jax.random.uniform(rng, (num_classes,))
    score = jnp.where(appeared, 2.0, noise)
    _, idx = jax.lax.top_k(score, num_sample)
    sel = jnp.zeros((num_classes,), bool).at[idx].set(True)
    # keep ALL appeared classes even if more than num_sample appeared
    return sel | appeared


def regionclip_loss(
    params: Any,
    teacher_params: Any,  # unused; signature parity
    batch: dict,
    model,
    rng: Optional[jax.Array] = None,
    *,
    noun_embeddings: jnp.ndarray = None,
    num_sample_cats: int = 100,
    contrast_weight: float = 1.0,
    extract_type: str = "v2",
) -> tuple[jnp.ndarray, dict]:
    """RegionCLIP region-text training (reference `RegionCLIP.__call__`,
    `region_clip.py:28-67`): box features vs. fixed noun embeddings with a
    federated BCE over sampled categories.

    batch:
      images: [B, S, S, 3]
      boxes:  [B, M, 6] xyxy normalized, class label, valid
    noun_embeddings: [C, D] L2-normalized text embeddings (constant).
    """
    images = batch["images"]
    boxes = batch["boxes"]
    b, m = boxes.shape[:2]
    valid = (boxes[..., 5] > 0.5).reshape(b * m)
    labels = boxes[..., 4].astype(jnp.int32).reshape(b * m)

    feats = model.apply(
        {"params": params}, images, boxes[..., :4],
        True, extract_type, method="encode_pseudo_boxes",
    ).reshape(b * m, -1)

    logit_scale = params["logit_scale"]
    temp = jax.lax.stop_gradient(jnp.exp(logit_scale))
    nouns = noun_embeddings.astype(jnp.float32)
    logits = feats.astype(jnp.float32) @ nouns.T * temp  # [BM, C]
    target = jax.nn.one_hot(labels, nouns.shape[0])

    cls_mask = _fed_class_mask(labels, valid, nouns.shape[0], num_sample_cats, rng)

    # BCE-with-logits, summed over sampled classes, mean over valid boxes
    per_elt = optax.sigmoid_binary_cross_entropy(logits, target) * cls_mask[None, :]
    per_box = per_elt.sum(-1)
    n_valid = jnp.maximum(valid.sum(), 1.0)
    loss = (per_box * valid).sum() / n_valid * contrast_weight
    return loss, {"loss_contrast": loss, "num_boxes": valid.sum()}

