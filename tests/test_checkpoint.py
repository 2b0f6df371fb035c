"""Checkpoint save/restore/ensemble semantics + eval metric math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipself_tpu.core.config import get_model_config
from clipself_tpu.eval.zero_shot import macc_with_is_thing
from clipself_tpu.models.factory import create_model
from clipself_tpu.train import checkpoint as ckpt
from clipself_tpu.train.optim import build_optimizer, make_schedule
from clipself_tpu.train.step import TrainState

CFG = get_model_config("EVA02-CLIP-Tiny-Test")


def test_save_restore_roundtrip(tmp_path):
    model, params = create_model(CFG, dtype=jnp.float32, seed=0)
    teacher = jax.tree.map(lambda x: x * 0.0, params)  # zeros for easy math
    tx = build_optimizer(
        params, make_schedule("const", 1e-3, 1, 10),
        unlocked_groups=CFG.vision.layers, num_layers=CFG.vision.layers,
    )
    state = TrainState.create(params, tx).replace(step=jnp.asarray(7, jnp.int32))

    target = ckpt.save_checkpoint(str(tmp_path / "ck"), state, teacher, epoch=2, alpha=0.7)
    # ensembled target = 0.7 * student + 0.3 * 0
    np.testing.assert_allclose(
        np.asarray(target["logit_scale"]), 0.7 * np.asarray(params["logit_scale"]), rtol=1e-6
    )

    # restore resumes the STUDENT params and optimizer
    fresh = TrainState.create(jax.tree.map(jnp.zeros_like, params), tx)
    restored, epoch = ckpt.restore_checkpoint(str(tmp_path / "ck"), fresh)
    assert epoch == 2
    assert int(restored.step) == 7
    np.testing.assert_allclose(
        np.asarray(restored.params["logit_scale"]), np.asarray(params["logit_scale"])
    )

    # load_params returns the ensembled weights
    loaded = ckpt.load_params(str(tmp_path / "ck"))
    np.testing.assert_allclose(
        np.asarray(loaded["logit_scale"]), 0.7 * np.asarray(params["logit_scale"]), rtol=1e-6
    )


def test_export_torch(tmp_path):
    torch = pytest.importorskip("torch")
    model, params = create_model(CFG, dtype=jnp.float32, seed=0)
    path = str(tmp_path / "export.pt")
    ckpt.export_torch(path, params, CFG, epoch=1, name="test")
    loaded = torch.load(path, map_location="cpu", weights_only=False)
    assert loaded["epoch"] == 1
    sd = loaded["state_dict"]
    assert "visual.blocks.0.attn.q_proj.weight" in sd
    assert "text.text_projection" in sd
    assert sd["visual.pos_embed"].shape[1] == CFG.vision.grid_size**2 + 1


def test_macc_with_is_thing():
    # 4 samples: two thing classes (0, 1), one stuff class (2)
    correct = np.array(
        [
            [1, 0, 0, 0, 0],  # class 0, thing: top1 hit
            [0, 1, 0, 0, 0],  # class 0, thing: top5 hit only
            [0, 0, 0, 0, 0],  # class 1, thing: miss
            [1, 0, 0, 0, 0],  # class 2, stuff: top1 hit
        ],
        dtype=np.float32,
    )
    labels = np.array([0, 0, 1, 2])
    is_thing = np.array([1, 1, 1, 0])
    r = macc_with_is_thing(correct, is_thing, labels, "rois")
    # class 0: top1 acc 0.5; class 1: 0 -> mean 0.25
    np.testing.assert_allclose(r["rois.thing.macc1"], 0.25)
    # class 0: top5 acc 1.0; class 1: 0 -> mean 0.5
    np.testing.assert_allclose(r["rois.thing.macc5"], 0.5)
    np.testing.assert_allclose(r["rois.stuff.macc1"], 1.0)


def test_create_model_from_orbax_dir(tmp_path):
    """create_model(pretrained=<orbax dir>) loads the ensembled params
    (the factory docstring's advertised Orbax path)."""
    model, params = create_model(CFG, dtype=jnp.float32, seed=0)
    teacher = jax.tree.map(lambda x: x * 0.0, params)
    tx = build_optimizer(
        params, make_schedule("const", 1e-3, 1, 10),
        unlocked_groups=CFG.vision.layers, num_layers=CFG.vision.layers,
    )
    state = TrainState.create(params, tx)
    ckpt.save_checkpoint(str(tmp_path / "ck"), state, teacher, epoch=1, alpha=0.7)

    _, loaded = create_model(CFG, dtype=jnp.float32, pretrained=str(tmp_path / "ck"))
    np.testing.assert_allclose(
        np.asarray(loaded["logit_scale"]),
        0.7 * np.asarray(params["logit_scale"]), rtol=1e-6,
    )


def test_create_model_unknown_tag_is_loud():
    """A pretrained value that is neither a path nor a catalog tag fails
    with the known-tags message, not a torch.load stack trace."""
    with pytest.raises(FileNotFoundError, match="neither a local path nor a known tag"):
        create_model(CFG, dtype=jnp.float32, pretrained="no-such-tag")
