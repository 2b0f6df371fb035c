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
