"""Contrastive CLIP losses.

Reference `src/open_clip/loss.py:19-215` implements ClipLoss with
cross-process feature gathering (`torch.distributed.nn.all_gather`) and a KL
distillation variant. Instantiated via `create_loss` but unused by the
shipped CLIPSelf/RegionCLIP methods — reproduced here for API completeness
and for contrastive fine-tuning workflows.

TPU-native design: under pjit the batch is a GLOBAL array sharded over the
`data` axis, so the "gather features from all GPUs" step disappears — the
full [N, N] similarity is expressed directly and XLA inserts the all-gather
on the contracting dimension. A shard_map variant (`local_loss_fn`) provides
the reference's `local_loss=True` semantics (per-device logits against the
gathered other-device features) for memory-constrained regimes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def clip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
) -> jnp.ndarray:
    """Symmetric InfoNCE over the (global) batch
    (reference `ClipLoss.forward`, `loss.py:107-131`)."""
    n = image_features.shape[0]
    logits = logit_scale * image_features.astype(jnp.float32) @ text_features.astype(
        jnp.float32
    ).T
    labels = jnp.arange(n)
    return 0.5 * (
        _cross_entropy(logits, labels).mean() + _cross_entropy(logits.T, labels).mean()
    )


def distill_clip_loss(
    student_image: jnp.ndarray,
    student_text: jnp.ndarray,
    teacher_image: jnp.ndarray,
    teacher_text: jnp.ndarray,
    logit_scale: jnp.ndarray,
    dist_logit_scale: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Contrastive + soft-label distillation
    (reference `DistillClipLoss`, `loss.py:176-215`).

    Returns (contrastive_loss, distill_loss) where distill_loss is the
    cross-entropy of the student's logits against the teacher's softened
    distribution, averaged over both directions.
    """
    ts = dist_logit_scale if dist_logit_scale is not None else logit_scale
    contrastive = clip_loss(student_image, student_text, logit_scale)

    s_logits = logit_scale * student_image.astype(jnp.float32) @ student_text.astype(jnp.float32).T
    t_logits = ts * teacher_image.astype(jnp.float32) @ teacher_text.astype(jnp.float32).T
    t_probs = jax.nn.softmax(t_logits, axis=-1)

    def soft_ce(logits, probs):
        return -(probs * jax.nn.log_softmax(logits, axis=-1)).sum(-1).mean()

    distill = 0.5 * (soft_ce(s_logits, t_probs) + soft_ce(s_logits.T, t_probs.T))
    return contrastive, distill


def local_clip_loss_fn(mesh, axis: str = "data"):
    """shard_map variant with the reference's local_loss semantics
    (`loss.py:49-63,107-120`): each device computes logits of its LOCAL
    features against the ALL-GATHERED features, with offset labels."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def _local(img, txt, scale):
        all_img = jax.lax.all_gather(img, axis, tiled=True)
        all_txt = jax.lax.all_gather(txt, axis, tiled=True)
        idx = jax.lax.axis_index(axis)
        n_local = img.shape[0]
        labels = jnp.arange(n_local) + idx * n_local
        li = scale * img.astype(jnp.float32) @ all_txt.astype(jnp.float32).T
        lt = scale * txt.astype(jnp.float32) @ all_img.astype(jnp.float32).T
        loss = 0.5 * (
            _cross_entropy(li, labels).mean() + _cross_entropy(lt, labels).mean()
        )
        return jax.lax.pmean(loss, axis)

    return shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(),
    )


def create_loss(dataset_type: str = "grid_distill"):
    """Loss routing by dataset type (reference `factory.py:252-264`): the
    contrastive dataset types get `clip_loss`, everything else the KL
    distillation variant. The shipped CLIPSelf/RegionCLIP methods compute
    their own losses and ignore this (as in the reference, where the
    created loss flows in as an unused argument)."""
    if dataset_type in ("sanity_check", "clipself", "clipself_proposals", "coco_caption"):
        return clip_loss
    return distill_clip_loss
