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


def trainable_labels(params: Any, unlocked_groups: int, num_layers: int, lock_image: bool = True) -> Any:
    """Label each leaf 'train' or 'freeze'.

    The text tower and logit_scale are always frozen (the loss detaches the
    temperature; the reference clamps but never meaningfully updates it in the
    shipped recipes). When lock_image is True, only the last
    ``unlocked_groups`` vision blocks train.
    """
    first_trainable = num_layers - unlocked_groups

    def decide(path, leaf):
        name = _path_str(path)
        if name.startswith("text/") or name == "logit_scale":
            return "freeze"
        if not lock_image:
            return "train"
        # visual/blocks_{i}/...
        parts = name.split("/")
        if len(parts) >= 2 and parts[0] == "visual" and parts[1].startswith("blocks_"):
            i = int(parts[1].split("_")[1])
            return "train" if i >= first_trainable else "freeze"
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
        params, unlocked_groups=unlocked_groups, num_layers=num_layers, lock_image=lock_image
    )
    tx = optax.multi_transform(
        {"train": adamw, "freeze": optax.set_to_zero()}, labels
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
