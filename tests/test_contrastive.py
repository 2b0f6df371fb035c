"""Contrastive loss: global pjit form vs shard_map local form must agree."""

import jax
import jax.numpy as jnp
import numpy as np

from clipself_tpu.parallel.mesh import create_mesh
from clipself_tpu.train.contrastive import clip_loss, distill_clip_loss, local_clip_loss_fn


def _feats(seed, n=16, d=8):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(n, d)).astype(np.float32)
    txt = rng.normal(size=(n, d)).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    return jnp.asarray(img), jnp.asarray(txt)


def test_clip_loss_perfect_alignment():
    img, _ = _feats(0)
    # identical features with high temperature -> near-zero loss
    loss = clip_loss(img, img, jnp.asarray(100.0))
    assert float(loss) < 0.01


def test_global_equals_local():
    img, txt = _feats(1)
    scale = jnp.asarray(10.0)
    global_loss = clip_loss(img, txt, scale)
    mesh = create_mesh()
    local_fn = local_clip_loss_fn(mesh)
    local_loss = local_fn(img, txt, scale)
    np.testing.assert_allclose(float(global_loss), float(local_loss), rtol=1e-5)


def test_distill_loss():
    img, txt = _feats(2)
    contrastive, distill = distill_clip_loss(img, txt, img, txt, jnp.asarray(10.0))
    # teacher == student -> distill loss equals the entropy of the teacher
    # distribution (minimum of soft CE); both finite and positive
    assert np.isfinite(float(contrastive)) and float(contrastive) > 0
    assert np.isfinite(float(distill)) and float(distill) > 0


def test_grad_flows():
    img, txt = _feats(3)
    g = jax.grad(lambda a: clip_loss(a, txt, jnp.asarray(10.0)))(img)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
