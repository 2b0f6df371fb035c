"""File IO / remote-sync / hub-packaging equivalents."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from clipself_tpu.utils.file_io import latest_checkpoint, pt_load, remote_sync_fsspec


def test_latest_checkpoint_natural_sort(tmp_path):
    for n in ["epoch_2.pt", "epoch_10.pt", "epoch_9.pt", "unrelated.txt"]:
        (tmp_path / n).write_bytes(b"x")
    got = latest_checkpoint(str(tmp_path))
    assert os.path.basename(got) == "epoch_10.pt"
    assert latest_checkpoint(str(tmp_path / "missing")) is None


def test_pt_load_local(tmp_path):
    import torch

    p = tmp_path / "m.pt"
    torch.save({"a": torch.ones(3)}, p)
    out = pt_load(str(p))
    assert float(out["a"].sum()) == 3.0


def test_remote_sync_fsspec_local(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    (src / "sub").mkdir(parents=True)
    (src / "a.bin").write_bytes(b"123")
    (src / "sub" / "b.bin").write_bytes(b"4567")
    assert remote_sync_fsspec(str(src), str(dst))
    assert (dst / "a.bin").read_bytes() == b"123"
    assert (dst / "sub" / "b.bin").read_bytes() == b"4567"
    # second sync is a no-op (size-matched files skipped)
    assert remote_sync_fsspec(str(src), str(dst))


def test_package_checkpoint(tmp_path):
    from clipself_tpu.core.config import get_model_config
    from clipself_tpu.models.factory import create_model
    from clipself_tpu.tools.push_to_hub import package_checkpoint

    cfg = get_model_config("EVA02-CLIP-Tiny-Test")
    _, params = create_model(cfg, dtype=jnp.float32)
    files = package_checkpoint(str(tmp_path), params, cfg)
    assert all(os.path.exists(f) for f in files)
    import torch

    sd = torch.load(files[0], map_location="cpu", weights_only=False)["state_dict"]
    assert any(k.startswith("visual.") for k in sd)
    import json

    meta = json.load(open(files[1]))
    assert meta["model_cfg"]["embed_dim"] == cfg.embed_dim


def test_config_registry_breadth():
    from clipself_tpu.core.config import get_model_config, list_models

    models = list_models()
    assert len(models) >= 18
    for name in ("ViT-bigG-14", "RN50x4", "EVA02-CLIP-bigE-14", "EVA01-CLIP-g-14"):
        assert name in models
        cfg = get_model_config(name)
        assert cfg.embed_dim > 0
    assert get_model_config("RN50x4").vision.resnet_layers == (4, 6, 10, 6)
    assert get_model_config("EVA02-CLIP-bigE-14").vision.postnorm
