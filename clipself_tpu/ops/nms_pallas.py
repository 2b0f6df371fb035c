"""Greedy NMS as a Pallas TPU kernel.

XLA expresses greedy NMS as a `lax.fori_loop` whose every iteration is a
separate tiny fusion — ~4.5 ms for 2,000 boxes on v5e. This kernel runs the
whole sequential suppression on-core: boxes live in VMEM as four [1, N]
coordinate rows (lane-major), each iteration is one scalar check + one
vectorized IoU row + a masked update of the suppression vector.

Contract: boxes are already sorted by score (descending) and padded to a
lane multiple; returns keep [1, N] float32 (1.0 = kept). Invalid slots are
marked via the `valid` row and never kept.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(coords_ref, valid_ref, thr_ref, keep_ref, sup_ref):
    n = coords_ref.shape[1]
    x0 = coords_ref[0:1, :]
    y0 = coords_ref[1:2, :]
    x1 = coords_ref[2:3, :]
    y1 = coords_ref[3:4, :]
    area = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)  # [1, N]
    thr = thr_ref[0, 0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    sup_ref[:] = 1.0 - valid_ref[:]  # invalid slots start suppressed
    keep_ref[:] = jnp.zeros_like(keep_ref)

    def body(i, carry):
        # Mosaic requires 128-aligned vector loads: extract per-box scalars
        # with masked row reductions and write back with masked row updates.
        is_i = idx == i

        def pick(row):
            return jnp.sum(jnp.where(is_i, row, 0.0))

        sup_i = pick(sup_ref[:])

        @pl.when(sup_i == 0.0)
        def _():
            keep_ref[:] = jnp.where(is_i, 1.0, keep_ref[:])
            xi0 = pick(x0)
            yi0 = pick(y0)
            xi1 = pick(x1)
            yi1 = pick(y1)
            iw = jnp.maximum(jnp.minimum(x1, xi1) - jnp.maximum(x0, xi0), 0.0)
            ih = jnp.maximum(jnp.minimum(y1, yi1) - jnp.maximum(y0, yi0), 0.0)
            inter = iw * ih
            ai = jnp.maximum(xi1 - xi0, 0.0) * jnp.maximum(yi1 - yi0, 0.0)
            iou = inter / jnp.maximum(area + ai - inter, 1e-6)
            hit = jnp.where((iou > thr) & (idx > i), 1.0, 0.0)
            sup_ref[:] = jnp.maximum(sup_ref[:], hit)

        return carry

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nms_keep_mask(
    sorted_boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold,
    interpret: bool = False,
) -> jnp.ndarray:
    """keep mask [N] (bool) for score-sorted boxes [N, 4] with validity [N].

    N is padded to a multiple of 128 internally.
    """
    n = sorted_boxes.shape[0]
    pad = (-n) % 128
    coords = jnp.concatenate(
        [sorted_boxes.astype(jnp.float32).T, jnp.zeros((4, pad), jnp.float32)], axis=1
    )
    v = jnp.concatenate(
        [valid.astype(jnp.float32), jnp.zeros((pad,), jnp.float32)]
    )[None, :]
    thr = jnp.asarray([[iou_threshold]], jnp.float32)
    npad = n + pad
    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((1, npad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, npad), jnp.float32)],
        interpret=interpret,
    )(coords, v, thr)
    return keep[0, :n] > 0.5


def pallas_nms_available() -> bool:
    return jax.default_backend() == "tpu"
