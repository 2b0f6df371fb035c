"""GPipe pipeline-parallel primitive on the simulated 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipself_tpu.parallel.mesh import create_mesh
from clipself_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_block_params,
    unstack_block_params,
)


def _toy_blocks(n_blocks=8, width=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        f"blocks_{i}": {
            "w": jnp.asarray(rng.normal(size=(width, width)) * 0.2, jnp.float32),
            "b": jnp.asarray(rng.normal(size=(width,)) * 0.1, jnp.float32),
        }
        for i in range(n_blocks)
    }


def _apply_toy(blk, x):
    return jnp.tanh(x @ blk["w"] + blk["b"])


def _sequential(params, x, n):
    for i in range(n):
        x = _apply_toy(params[f"blocks_{i}"], x)
    return x


def test_stack_roundtrip():
    params = _toy_blocks()
    stacked, n = stack_block_params(params)
    assert n == 8
    back = unstack_block_params(stacked)
    for k in params:
        np.testing.assert_array_equal(back[k]["w"], params[k]["w"])


@pytest.mark.parametrize("stages,microbatches", [(2, 4), (4, 8), (8, 8)])
def test_pipeline_matches_sequential(stages, microbatches):
    params = _toy_blocks()
    stacked, n = stack_block_params(params)
    mesh = create_mesh(stages, axis_names=("pp",))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(16, 16)), jnp.float32)
    out = pipeline_apply(mesh, stacked, _apply_toy, x, microbatches)
    ref = _sequential(params, x, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pipeline_gradients_match_sequential():
    params = _toy_blocks()
    stacked, n = stack_block_params(params)
    mesh = create_mesh(4, axis_names=("pp",))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 16)), jnp.float32)

    def loss_pp(stacked):
        return jnp.sum(pipeline_apply(mesh, stacked, _apply_toy, x, 4) ** 2)

    def loss_seq(params):
        return jnp.sum(_sequential(params, x, n) ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_seq = jax.grad(loss_seq)(params)
    g_seq_stacked, _ = stack_block_params(g_seq)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq_stacked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pipeline_on_eva_blocks():
    """The primitive pipelines REAL EVA blocks: 2-stage pipeline over the
    tiny tower's stacked block params equals the sequential trunk."""
    from clipself_tpu.core.config import get_model_config
    from clipself_tpu.models.eva_vit import EvaBlock
    from clipself_tpu.models.factory import create_model

    cfg = get_model_config("EVA02-CLIP-Tiny-Test")
    model, params = create_model(cfg, dtype=jnp.float32, seed=0)
    vparams = dict(params["visual"])
    stacked, n = stack_block_params(vparams)
    assert n == cfg.vision.layers

    block = EvaBlock(cfg.vision, dtype=jnp.float32, attn_impl="xla")
    grid = (cfg.vision.grid_size, cfg.vision.grid_size)

    def apply_block(blk, x):
        return block.apply({"params": blk}, x, grid)

    tokens = jnp.asarray(
        np.random.default_rng(3).normal(size=(4, grid[0] * grid[1] + 1, cfg.vision.width)),
        jnp.float32,
    )
    mesh = create_mesh(2, axis_names=("pp",))
    out = pipeline_apply(mesh, stacked, apply_block, tokens, 2)
    ref = tokens
    for i in range(n):
        ref = apply_block(vparams[f"blocks_{i}"], ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
