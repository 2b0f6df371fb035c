"""ModifiedResNet tower: shapes, dense protocol, v1/v2 roi features."""

import jax.numpy as jnp
import numpy as np
import pytest

from clipself_tpu.core.config import get_model_config
from clipself_tpu.models.factory import create_model

CFG = get_model_config("RN-Tiny-Test")


@pytest.fixture(scope="module")
def model_and_params():
    return create_model(CFG, dtype=jnp.float32, seed=0)


def test_config_resnet_detection():
    assert CFG.vision.resnet_layers == (1, 1, 1, 1)


def test_encode_image(model_and_params):
    model, params = model_and_params
    img = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
    feats = model.apply({"params": params}, img, method="encode_image")
    assert feats.shape == (2, CFG.embed_dim)


def test_encode_dense(model_and_params):
    model, params = model_and_params
    img = jnp.asarray(np.random.default_rng(1).normal(size=(1, 64, 64, 3)), jnp.float32)
    dense = model.apply({"params": params}, img, keep_shape=True, method="encode_dense")
    assert dense.shape == (1, 2, 2, CFG.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(dense), axis=-1), 1.0, atol=1e-5)


def test_roi_v1_v2(model_and_params):
    model, params = model_and_params
    img = jnp.asarray(np.random.default_rng(2).normal(size=(1, 64, 64, 3)), jnp.float32)
    boxes = jnp.asarray([[[0.0, 0.0, 1.0, 1.0], [0.1, 0.1, 0.6, 0.6]]])
    v1 = model.apply({"params": params}, img, boxes, True, "v1", method="encode_pseudo_boxes")
    v2 = model.apply({"params": params}, img, boxes, True, "v2", method="encode_pseudo_boxes")
    assert v1.shape == v2.shape == (1, 2, CFG.embed_dim)
    assert np.isfinite(np.asarray(v1)).all() and np.isfinite(np.asarray(v2)).all()
    # the two extraction styles are different computations
    assert np.abs(np.asarray(v1) - np.asarray(v2)).max() > 1e-3


def test_variable_resolution(model_and_params):
    model, params = model_and_params
    img = jnp.asarray(np.random.default_rng(3).normal(size=(1, 128, 128, 3)), jnp.float32)
    dense = model.apply({"params": params}, img, keep_shape=True, method="encode_dense")
    assert dense.shape == (1, 4, 4, CFG.embed_dim)
