"""Separable image/grid resizing as precomputed weight-matrix matmuls.

TPU-first design: instead of per-pixel gather loops (the CUDA approach behind
`torch.nn.functional.interpolate`), each 2-D resize with static shapes is two
small dense matmuls ``out = W_h @ img @ W_w.T`` that XLA maps straight onto
the MXU. The interpolation weights reproduce PyTorch's `interpolate` sampling
semantics (`align_corners=False`; bicubic with A=-0.75) so that resized
positional embeddings match the reference pipeline
(reference behavior: `src/open_clip/eva_clip/eva_vit_model.py:631-643`).

Weight matrices are built in NumPy at trace time (shapes are static under
jit) and become compile-time constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_weights(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution weights for the 4 taps around fractional offset t.

    Uses the same A=-0.75 Keys kernel as PyTorch's bicubic implementation.
    Returns array of shape t.shape + (4,).
    """
    t = np.asarray(t, dtype=np.float64)
    # taps at offsets (-1-t, -t, 1-t, 2-t) relative to the sample point
    x0 = t + 1.0
    x1 = t
    x2 = 1.0 - t
    x3 = 2.0 - t

    def near(x):  # |x| <= 1
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0

    def far(x):  # 1 < |x| < 2
        return ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a

    w = np.stack([far(x0), near(x1), near(x2), far(x3)], axis=-1)
    return w


@functools.lru_cache(maxsize=256)
def resize_weight_matrix(in_size: int, out_size: int, method: str = "bicubic") -> np.ndarray:
    """Build a row-stochastic [out_size, in_size] interpolation matrix.

    Matches torch.nn.functional.interpolate(align_corners=False) sampling:
    src = (dst + 0.5) * (in/out) - 0.5, with border-clamped taps.
    """
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if method == "bicubic":
        i0 = np.floor(src).astype(np.int64)
        t = src - i0
        cw = _cubic_weights(t)  # [out, 4]
        for k in range(4):
            idx = np.clip(i0 - 1 + k, 0, in_size - 1)
            np.add.at(w, (dst.astype(np.int64), idx), cw[:, k])
    elif method == "bilinear":
        s = np.maximum(src, 0.0)
        i0 = np.minimum(np.floor(s).astype(np.int64), in_size - 1)
        i1 = np.minimum(i0 + 1, in_size - 1)
        frac = np.clip(s - i0, 0.0, 1.0)
        np.add.at(w, (dst.astype(np.int64), i0), 1.0 - frac)
        np.add.at(w, (dst.astype(np.int64), i1), frac)
    elif method == "nearest":
        # torch/mmdet 'nearest': src index = floor(dst * in/out)
        idx = np.minimum((dst * scale).astype(np.int64), in_size - 1)
        w[dst.astype(np.int64), idx] = 1.0
    else:
        raise ValueError(f"unknown method: {method}")
    return w.astype(np.float32)


def resize_2d(x: jnp.ndarray, out_hw: tuple[int, int], method: str = "bicubic") -> jnp.ndarray:
    """Resize the trailing two spatial dims of ``x[..., H, W]`` to ``out_hw``.

    Computed as two matmuls in float32 for numerical parity, cast back to the
    input dtype.
    """
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    wh = jnp.asarray(resize_weight_matrix(h_in, h_out, method))
    ww = jnp.asarray(resize_weight_matrix(w_in, w_out, method))
    orig_dtype = x.dtype
    y = x.astype(jnp.float32)
    # HIGHEST: keep true f32 accumulation on TPU (parity with the reference's
    # fp32 interpolation of positional embeddings).
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,...hw->...ow", wh, y, precision=hi)
    y = jnp.einsum("pw,...ow->...op", ww, y, precision=hi)
    return y.astype(orig_dtype)


def resize_nhwc(x: jnp.ndarray, out_hw: tuple[int, int], method: str = "bilinear") -> jnp.ndarray:
    """Resize ``x[B, H, W, C]`` to ``[B, h, w, C]`` (channels-last)."""
    b, h, w, c = x.shape
    y = jnp.moveaxis(x, -1, 1)  # [B, C, H, W]
    y = resize_2d(y, out_hw, method)
    return jnp.moveaxis(y, 1, -1)
