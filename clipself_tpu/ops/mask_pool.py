"""Mask pooling over dense token maps.

Average of dense (already-normalized) patch features under a binary mask —
reference semantics at `src/open_clip/eva_clip/eva_vit_model.py:645-653`.
TPU design: a single masked-mean einsum over fixed-shape padded masks.
"""

from __future__ import annotations

import jax.numpy as jnp


def mask_pool(feats: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """Pool features under binary masks.

    Args:
      feats: [B, H, W, C] dense feature map.
      masks: [B, M, H, W] binary masks ({0,1}; padded masks may be all-zero).

    Returns:
      [B, M, C] mask-averaged features (all-zero mask yields ~0 vector, as in
      the reference's +1e-12 denominator guard).
    """
    b, h, w, c = feats.shape
    m = masks.reshape(b, -1, h * w).astype(jnp.float32)
    flat = feats.reshape(b, h * w, c).astype(jnp.float32)
    summed = jnp.einsum("bmn,bnc->bmc", m, flat, preferred_element_type=jnp.float32)
    denom = m.sum(axis=-1, keepdims=True) + 1e-12
    return (summed / denom).astype(feats.dtype)
