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


def _split_sin_np(sin: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Bake the pairwise-rotation signs and lane parity into two sin tables.

    ``x*cos + rotate_half(x)*sin`` deinterleaves lanes (stride-2 gathers —
    slow on the TPU VPU). The identical value is a pair of lane rolls:

        out = x*cos + roll(x, -1)*sin_a + roll(x, +1)*sin_b

    where sin_a = -sin on even lanes (0 on odd) multiplies the left-rolled
    tensor (bringing x[2i+1] to lane 2i) and sin_b = +sin on odd lanes
    multiplies the right-rolled one (bringing x[2i] to lane 2i+1). The
    wrap-around lanes land on zeroed table entries. Bit-identical to
    rotate_half (each lane adds exactly one nonzero product).
    """
    parity = np.arange(sin.shape[-1]) % 2
    sin_a = np.where(parity == 0, -sin, 0.0).astype(sin.dtype)
    sin_b = np.where(parity == 1, sin, 0.0).astype(sin.dtype)
    return sin_a, sin_b


@functools.lru_cache(maxsize=64)
def rope_tables_padded_np(
    grid_h: int,
    grid_w: int,
    rope_dim: int,
    n_prefix: int,
    n_total: int,
    pt_seq_len: int = 16,
    theta: float = 10000.0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full-sequence (cos, sin_a, sin_b) tables of shape [n_total, 2*rope_dim].

    Rows outside [n_prefix, n_prefix + H*W) — the CLS prefix and any
    flash-padding tail — get cos=1 / sin=0, i.e. identity rotation, so the
    caller can rotate the whole padded tensor in one fused elementwise pass
    instead of slicing out the patch tokens and concatenating them back
    (two full-tensor copies per q/k per layer)."""
    cos_p, sin_p = rope_tables_np(grid_h, grid_w, rope_dim, pt_seq_len, theta)
    d = 2 * rope_dim
    n_patch = grid_h * grid_w
    if n_prefix + n_patch > n_total:
        raise ValueError(f"rope table: {n_prefix}+{n_patch} patches > {n_total} tokens")
    cos = np.ones((n_total, d), np.float32)
    sin = np.zeros((n_total, d), np.float32)
    cos[n_prefix : n_prefix + n_patch] = cos_p
    sin[n_prefix : n_prefix + n_patch] = sin_p
    sin_a, sin_b = _split_sin_np(sin)
    return cos, sin_a, sin_b


def _apply_rolled(x, cos, sin_a, sin_b):
    return (
        x * cos
        + jnp.roll(x, -1, axis=-1) * sin_a
        + jnp.roll(x, 1, axis=-1) * sin_b
    )


def apply_rope(x: jnp.ndarray, grid_h: int, grid_w: int, pt_seq_len: int = 16) -> jnp.ndarray:
    """Rotate patch tokens ``x[..., N, H, D]`` where N == grid_h * grid_w and
    H is the head axis (broadcast over).

    D is the full head dim; the tables cover all of it (two halves, one per
    spatial axis).
    """
    d = x.shape[-1]
    cos_np, sin_np = rope_tables_np(grid_h, grid_w, d // 2, pt_seq_len)
    sa_np, sb_np = _split_sin_np(sin_np)
    cos = jnp.asarray(cos_np[:, None, :], dtype=x.dtype)  # [N, 1, D]
    sin_a = jnp.asarray(sa_np[:, None, :], dtype=x.dtype)
    sin_b = jnp.asarray(sb_np[:, None, :], dtype=x.dtype)
    return _apply_rolled(x, cos, sin_a, sin_b)


def apply_rope_padded(
    x: jnp.ndarray,
    grid_h: int,
    grid_w: int,
    n_prefix: int = 1,
    pt_seq_len: int = 16,
) -> jnp.ndarray:
    """Rotate a full padded sequence ``x[B, N, H, D]`` in place: the first
    ``n_prefix`` tokens (CLS) and any tail beyond the H*W patch block get the
    identity rotation baked into the tables. Equals the slice/rotate/concat
    composition bit-for-bit while staying one fused elementwise op."""
    d = x.shape[-1]
    cos_np, sa_np, sb_np = rope_tables_padded_np(
        grid_h, grid_w, d // 2, n_prefix, x.shape[1], pt_seq_len
    )
    cos = jnp.asarray(cos_np[:, None, :], dtype=x.dtype)  # [N, 1, D]
    sin_a = jnp.asarray(sa_np[:, None, :], dtype=x.dtype)
    sin_b = jnp.asarray(sb_np[:, None, :], dtype=x.dtype)
    return _apply_rolled(x, cos, sin_a, sin_b)


@functools.lru_cache(maxsize=64)
def rope_tables_flat_np(
    grid_h: int,
    grid_w: int,
    head_dim: int,
    n_heads: int,
    n_prefix: int,
    n_total: int,
    pt_seq_len: int = 16,
    theta: float = 10000.0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Padded rolled tables tiled across heads: shape [n_total, n_heads*head_dim].

    Rope is head-independent (the same [N, head_dim] table applies to every
    head), and the ±1-lane rolls never cross a head_dim boundary: nonzero
    sin_a sits on even lanes (reads lane+1, same pair) and nonzero sin_b on
    odd lanes (reads lane-1). So the rotation can run on the FLAT [B, N,
    width] projection output — full 128-lane tiles instead of the padded
    [B, N, H, 64] layout (64 = half a lane tile on TPU), and no head-split
    relayout on the elementwise path."""
    cos, sin_a, sin_b = rope_tables_padded_np(
        grid_h, grid_w, head_dim // 2, n_prefix, n_total, pt_seq_len, theta
    )
    tile = lambda t: np.tile(t, (1, n_heads))
    return tile(cos), tile(sin_a), tile(sin_b)


def apply_rope_flat(
    x: jnp.ndarray,
    grid_h: int,
    grid_w: int,
    head_dim: int,
    n_prefix: int = 1,
    pt_seq_len: int = 16,
) -> jnp.ndarray:
    """Rotate a full padded sequence in flat layout ``x[B, N, H*head_dim]``."""
    w = x.shape[-1]
    cos_np, sa_np, sb_np = rope_tables_flat_np(
        grid_h, grid_w, head_dim, w // head_dim, n_prefix, x.shape[1], pt_seq_len
    )
    cos = jnp.asarray(cos_np, dtype=x.dtype)  # [N, W]
    sin_a = jnp.asarray(sa_np, dtype=x.dtype)
    sin_b = jnp.asarray(sb_np, dtype=x.dtype)
    from clipself_tpu.core import knobs
    from clipself_tpu.ops import rope_roll

    if (
        knobs.get("pallas_rope")
        and _pallas_rope_available()
        and rope_roll.supported(x.shape[1], w=w, itemsize=x.dtype.itemsize)
    ):
        # fuse the two jnp.roll materializations into one VMEM pass; the
        # backward reuses the kernel with trace-time-rolled tables (same
        # math/dtype; ~1 ULP from FMA association, test_rope_roll.py)
        from clipself_tpu.ops.rope_roll import rolled_rope

        a_bwd = jnp.asarray(np.roll(sa_np, 1, axis=-1), dtype=x.dtype)
        b_bwd = jnp.asarray(np.roll(sb_np, -1, axis=-1), dtype=x.dtype)
        return rolled_rope(x, cos, sin_a, sin_b, a_bwd, b_bwd)
    return _apply_rolled(x, cos, sin_a, sin_b)


def _pallas_rope_available() -> bool:
    import jax

    return jax.default_backend() == "tpu"


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
    sa_np, sb_np = _split_sin_np(sin_np)
    cos = jnp.asarray(cos_np, x.dtype)[keep_idx][:, :, None, :]  # [B, K, 1, D]
    sin_a = jnp.asarray(sa_np, x.dtype)[keep_idx][:, :, None, :]
    sin_b = jnp.asarray(sb_np, x.dtype)[keep_idx][:, :, None, :]
    return _apply_rolled(x, cos, sin_a, sin_b)
