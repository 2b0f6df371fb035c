"""Optimizer and LR schedules.

Reference semantics reproduced:
  - AdamW with two parameter groups — no weight decay for gains/biases/1-D
    params/logit_scale (`src/training/main.py:198-213`)
  - image-tower locking with the last-N-blocks unlocked
    (`src/open_clip/eva_clip/eva_vit_model.py:500-516`, `main.py:161-166`);
    the text tower is always frozen (`eva_clip/model.py:286-294`)
  - warmup + {cosine, const, const-cooldown} per-step schedules
    (`src/training/scheduler.py:13-53`)

JAX design: freezing is an optimizer-mask concern (optax.multi_transform with
`set_to_zero` for frozen leaves), not parameter surgery.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import optax


# ---------------------------------------------------------------------------
# schedules (per-step closures, matching the reference formulas)


def warmup_cosine(base_lr: float, warmup: int, total_steps: int) -> Callable:
    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1.0) / max(warmup, 1)
        e = step - warmup
        es = max(total_steps - warmup, 1)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * e / es)) * base_lr
        return jnp.where(step < warmup, warm, cos)

    return lr


def warmup_const(base_lr: float, warmup: int, total_steps: int) -> Callable:
    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1.0) / max(warmup, 1)
        return jnp.where(step < warmup, warm, base_lr)

    return lr


def warmup_const_cooldown(
    base_lr: float,
    warmup: int,
    total_steps: int,
    cooldown_steps: int,
    cooldown_power: float = 1.0,
    cooldown_end_lr: float = 0.0,
) -> Callable:
    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1.0) / max(warmup, 1)
        start = total_steps - cooldown_steps
        e = step - start
        es = max(cooldown_steps, 1)
        decay = (1.0 - e / es) ** cooldown_power
        cool = decay * (base_lr - cooldown_end_lr) + cooldown_end_lr
        lr_ = jnp.where(step < start, base_lr, cool)
        return jnp.where(step < warmup, warm, lr_)

    return lr


def make_schedule(name: str, base_lr: float, warmup: int, total_steps: int, **kw) -> Callable:
    if name == "cosine":
        return warmup_cosine(base_lr, warmup, total_steps)
    if name == "const":
        return warmup_const(base_lr, warmup, total_steps)
    if name == "const-cooldown":
        return warmup_const_cooldown(base_lr, warmup, total_steps, **kw)
    raise ValueError(f"unknown scheduler: {name}")


# ---------------------------------------------------------------------------
# parameter labeling


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)


def no_decay_mask(params: Any) -> Any:
    """True where weight decay applies. Reference exclude rule:
    ndim < 2 or name contains bn/ln/bias/logit_scale (`main.py:200-204`)."""

    def decide(path, leaf):
        name = _path_str(path).lower()
        if leaf.ndim < 2:
            return False
        if any(s in name for s in ("bn", "ln_", "norm", "bias", "logit_scale")):
            return False
        return True

    return jtu.tree_map_with_path(decide, params)


def trainable_labels(
    params: Any,
    unlocked_groups: int,
    num_layers: int,
    lock_image: bool = True,
    freeze_bn_stats: bool = False,
) -> Any:
    """Label each leaf 'train' or 'freeze'.

    The text tower and logit_scale are always frozen (the loss detaches the
    temperature; the reference clamps but never meaningfully updates it in the
    shipped recipes). When lock_image is True, only the last
    ``unlocked_groups`` vision groups train, following each tower family's
    reference lock():
      - EVA / OpenCLIP ViT: the last N transformer blocks (`eva_vit_model.py:
        500-516`, `transformer.py:391-409` — ln_post/proj/stem stay frozen in
        both; the commented-out group entries in the reference are frozen).
      - ModifiedResNet: groups = [stem, layer1..layer4], frozen while their
        index <= 5 - N; attnpool is never locked (`modified_resnet.py:255-278`).
    """
    import re

    first_trainable = num_layers - unlocked_groups
    freeze_at = 5 - unlocked_groups  # ResNet group formula
    # 'conv1' is a ViT stem in one family and the ResNet stem in the other
    visual = params.get("visual", {}) if hasattr(params, "get") else {}
    is_resnet = "bn1" in visual

    def decide(path, leaf):
        name = _path_str(path)
        if name.startswith("text/") or name == "logit_scale":
            return "freeze"
        if freeze_bn_stats and re.search(r"/(?:downsample_)?bn\d*/(?:mean|var)$", name):
            # `--lock-image-freeze-bn-stats` (reference main.py:165): BN
            # running stats stay at their pretrained values even inside
            # unlocked groups. Here stats live in the param tree (torch keeps
            # them as buffers that only forward-momentum updates touch), so
            # freezing = masking them from the optimizer.
            return "freeze"
        if not lock_image:
            return "train"
        parts = name.split("/")
        if len(parts) < 2 or parts[0] != "visual":
            return "freeze"
        p1 = parts[1]
        m = re.match(r"(?:res)?blocks_(\d+)$", p1)
        if m:
            return "train" if int(m.group(1)) >= first_trainable else "freeze"
        m = re.match(r"layer(\d+)_\d+$", p1)  # ResNet stage s -> lock group s+1
        if m:
            return "freeze" if int(m.group(1)) + 1 <= freeze_at else "train"
        if p1 == "attnpool":
            return "train"
        if (p1 in ("conv2", "conv3", "bn1", "bn2", "bn3")) or (
            p1 == "conv1" and is_resnet
        ):  # ResNet stem = lock group 1
            return "freeze" if freeze_at >= 1 else "train"
        # ViT stem/pos-embed/final norm/head: frozen under lock (see above)
        return "freeze"

    return jtu.tree_map_with_path(decide, params)


def build_optimizer(
    params: Any,
    schedule: Callable,
    *,
    wd: float = 0.1,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    grad_clip_norm: Optional[float] = None,
    unlocked_groups: int = 0,
    num_layers: int = 12,
    lock_image: bool = True,
    accum_steps: int = 1,
    freeze_bn_stats: bool = False,
) -> optax.GradientTransformation:
    """AdamW with reference-parity decay mask and image-tower locking.

    `accum_steps > 1` enables gradient accumulation (the reference exposes
    `--accum-freq` but hard-disables it, `src/training/train.py:89`; here it
    is first-class via `optax.MultiSteps`)."""
    adamw = optax.chain(
        optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps),
        optax.add_decayed_weights(wd, mask=no_decay_mask),
        optax.scale_by_learning_rate(schedule),
    )
    if grad_clip_norm is not None:
        adamw = optax.chain(optax.clip_by_global_norm(grad_clip_norm), adamw)
    labels = trainable_labels(
        params, unlocked_groups=unlocked_groups, num_layers=num_layers,
        lock_image=lock_image, freeze_bn_stats=freeze_bn_stats,
    )
    tx = optax.multi_transform(
        {"train": adamw, "freeze": optax.set_to_zero()}, labels
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
