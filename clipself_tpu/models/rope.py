"""2-D axial rotary position embeddings for vision transformers.

Semantics match the reference's `VisionRotaryEmbeddingFast`
(`src/open_clip/eva_clip/rope.py:96-214`): per-axis rotary frequencies with
``t = arange(S) / S * pt_seq_len`` (so any grid size maps onto the same
pretrained 16x16 coordinate range), each frequency repeated twice, and the
h/w tables concatenated to cover the full head dim. The CLS token is not
rotated (handled by the caller).

TPU-first: tables are a pure function of the static grid shape, computed in
NumPy at trace time and baked into the compiled program as constants — the
reference's runtime cache of per-resolution buffers (`rope.py:179-214`)
becomes "one compiled executable per input shape", which is the natural XLA
model.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def rope_tables_np(
    grid_h: int,
    grid_w: int,
    rope_dim: int,
    pt_seq_len: int = 16,
    theta: float = 10000.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Build (cos, sin) tables of shape [grid_h * grid_w, 2 * rope_dim].

    ``rope_dim`` is half the head dim (each spatial axis rotates half).
    """
    freqs = 1.0 / (
        theta ** (np.arange(0, rope_dim, 2)[: rope_dim // 2].astype(np.float64) / rope_dim)
    )  # [rope_dim // 2]

    def axis_freqs(size: int) -> np.ndarray:
        t = np.arange(size, dtype=np.float64) / size * pt_seq_len
        f = np.outer(t, freqs)  # [size, rope_dim // 2]
        return np.repeat(f, 2, axis=-1)  # [size, rope_dim]

    fh = axis_freqs(grid_h)  # [H, D]
    fw = axis_freqs(grid_w)  # [W, D]
    full = np.concatenate(
        [
            np.broadcast_to(fh[:, None, :], (grid_h, grid_w, rope_dim)),
            np.broadcast_to(fw[None, :, :], (grid_h, grid_w, rope_dim)),
        ],
        axis=-1,
    ).reshape(grid_h * grid_w, 2 * rope_dim)
    return np.cos(full).astype(np.float32), np.sin(full).astype(np.float32)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotation: (x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rope(x: jnp.ndarray, grid_h: int, grid_w: int, pt_seq_len: int = 16) -> jnp.ndarray:
    """Rotate patch tokens ``x[..., N, H, D]`` where N == grid_h * grid_w and
    H is the head axis (broadcast over).

    D is the full head dim; the tables cover all of it (two halves, one per
    spatial axis).
    """
    d = x.shape[-1]
    cos_np, sin_np = rope_tables_np(grid_h, grid_w, d // 2, pt_seq_len)
    cos = jnp.asarray(cos_np[:, None, :], dtype=x.dtype)  # [N, 1, D]
    sin = jnp.asarray(sin_np[:, None, :], dtype=x.dtype)
    return x * cos + rotate_half(x) * sin


def apply_rope_gathered(
    x: jnp.ndarray,
    keep_idx: jnp.ndarray,
    grid_h: int,
    grid_w: int,
    pt_seq_len: int = 16,
) -> jnp.ndarray:
    """Rotate a patch-dropout-reduced token set ``x[B, K, H, D]`` whose
    original grid positions are ``keep_idx[B, K]`` (reference rope gather
    path, `src/open_clip/eva_clip/rope.py:148-162`)."""
    d = x.shape[-1]
    cos_np, sin_np = rope_tables_np(grid_h, grid_w, d // 2, pt_seq_len)
    cos = jnp.asarray(cos_np, x.dtype)[keep_idx][:, :, None, :]  # [B, K, 1, D]
    sin = jnp.asarray(sin_np, x.dtype)[keep_idx][:, :, None, :]
    return x * cos + rotate_half(x) * sin
