"""Tools: profiler cost analysis, prompt-ensemble embeddings (end-to-end)."""

import json

import jax.numpy as jnp
import numpy as np

from clipself_tpu.core.config import get_model_config
from clipself_tpu.models.factory import create_model


def test_profile_model_tiny():
    from clipself_tpu.tools.profile_model import profile_model

    out = profile_model("EVA02-CLIP-Tiny-Test", image_sizes=[32], batch_size=1)
    assert out["params_m"] > 0
    assert out["encode_image@32"]["gflops"] > 0
    assert out["encode_dense@32"]["gflops"] > 0


def test_text_embeddings_build_and_cli(tmp_path):
    from clipself_tpu.tools.text_embeddings import build_text_embeddings, category_prompts

    prompts = category_prompts("traffic light")
    assert any(p.startswith("This is ") for p in prompts)
    assert len(prompts) > 50  # ViLD template count

    # the tiny config's 512-token vocab can't hold real BPE ids; use a
    # full-vocab text tower for the embedding-quality assertions
    import dataclasses

    cfg = get_model_config("EVA02-CLIP-Tiny-Test")
    cfg_full = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, vocab_size=49408)
    )
    model, params = create_model(cfg_full, dtype=jnp.float32)
    emb = build_text_embeddings(model, params, ["cat", "dog"])
    assert emb.shape == (2, cfg.embed_dim)
    assert np.isfinite(emb).all()
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)

    # CLI with a class-names JSON + background row
    import sys

    from clipself_tpu.tools import text_embeddings as te

    classes = tmp_path / "classes.json"
    classes.write_text(json.dumps(["cat", "dog", "zebra"]))
    out = tmp_path / "emb.npy"
    argv = sys.argv
    sys.argv = [
        "text_embeddings", "--model", "EVA02-CLIP-Tiny-Test",
        "--classes-json", str(classes), "--add-background", "--out", str(out),
    ]
    try:
        te.main()
    finally:
        sys.argv = argv
    arr = np.load(out)
    assert arr.shape == (4, cfg.embed_dim)  # 3 classes + background


def test_hub_config_round_trips_through_config_from_dict(tmp_path):
    """The packaged open_clip_config.json must contain only reference-format
    keys: config_from_dict (which now rejects unknown keys, as the
    reference's **cfg unpack does) must rebuild the same architecture."""
    import json

    import jax.numpy as jnp

    from clipself_tpu.core.config import config_from_dict, get_model_config
    from clipself_tpu.models.factory import create_model
    from clipself_tpu.tools.push_to_hub import package_checkpoint

    cfg = get_model_config("EVA02-CLIP-Tiny-Test")
    model, params = create_model(cfg, dtype=jnp.float32, seed=0)
    package_checkpoint(str(tmp_path), params, cfg)
    d = json.load(open(tmp_path / "open_clip_config.json"))
    rebuilt = config_from_dict(d["model_cfg"], name="round-trip")
    assert rebuilt.embed_dim == cfg.embed_dim
    assert rebuilt.vision.layers == cfg.vision.layers
    assert rebuilt.vision.width == cfg.vision.width
    assert rebuilt.vision.rope == cfg.vision.rope
    assert rebuilt.text.vocab_size == cfg.text.vocab_size


def test_throughput_meter_windows():
    """window() reports the interval since the previous window()/reset() —
    a slow first interval (compile) must not drag later reports."""
    import time

    from clipself_tpu.utils.meters import AverageMeter, ThroughputMeter

    m = ThroughputMeter(n_chips=2)
    m.update(10)
    time.sleep(0.05)
    first = m.window()
    assert 0 < first < 10 / 0.05 + 1
    # new window: much faster rate must be reported, unpolluted by the first
    m.update(100)
    time.sleep(0.01)
    second = m.window()
    assert second > first
    assert m.images_per_sec == 0.0  # fresh window

    a = AverageMeter()
    for v in (1.0, 2.0, 3.0):
        a.update(v)
    assert a.avg == 2.0 and a.val == 3.0
