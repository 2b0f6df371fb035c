"""OpenAI CLIP checkpoint loading (torch.jit archives and state dicts).

Re-designs `src/open_clip/openai.py:23-144` + the state-dict model builder
(`src/open_clip/model.py:417-474`): a JIT archive or plain `.pt` is reduced
to a NumPy state dict, the architecture hyperparameters are inferred from
tensor shapes, keys are remapped to the reference `CustomCLIP` layout, and
the result imports through `torch_io` into Flax params.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from clipself_tpu.core.config import CLIPConfig, TextConfig, VisionConfig


def load_openai_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch.jit archive (or plain checkpoint) to numpy arrays."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def config_from_openai_state_dict(sd: dict[str, np.ndarray]) -> CLIPConfig:
    """Infer the architecture from tensor shapes (reference
    `build_model_from_openai_state_dict`, `src/open_clip/model.py:417-448`)."""
    # ResNets also have visual.conv1 — the projection matrix is the ViT
    # discriminator (reference `model.py:421`)
    is_vit = "visual.proj" in sd
    embed_dim = sd["text_projection"].shape[1]
    if is_vit:
        width = sd["visual.conv1.weight"].shape[0]
        patch = sd["visual.conv1.weight"].shape[-1]
        layers = len(
            {k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")}
        )
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        vision = VisionConfig(
            image_size=grid * patch, layers=layers, width=width,
            head_width=64, patch_size=patch, mlp_ratio=4.0, ln_eps=1e-5,
            quick_gelu=True,  # all OpenAI releases use QuickGELU
        )
    else:
        counts = [
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}.")})
            for b in (1, 2, 3, 4)
        ]
        # stem width (64 for RN50) — reference `model.py:435` reads it off the
        # stage-1 bottleneck's first conv directly
        width = sd["visual.layer1.0.conv1.weight"].shape[0]
        spatial = round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        vision = VisionConfig(
            image_size=spatial * 32, layers=len(counts), width=width,
            head_width=64, patch_size=32,
            resnet_layers=tuple(counts), ln_eps=1e-5, quick_gelu=True,
        )
    text = TextConfig(
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        width=sd["ln_final.weight"].shape[0],
        heads=sd["ln_final.weight"].shape[0] // 64,
        layers=len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")}),
        ln_eps=1e-5, quick_gelu=True,
    )
    return CLIPConfig(embed_dim=embed_dim, vision=vision, text=text, name="openai")


def remap_openai_keys(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """OpenAI layout -> reference CustomCLIP layout (text tower under
    `text.`; visual keys already match)."""
    out = {}
    for k, v in sd.items():
        if k in ("input_resolution", "context_length", "vocab_size"):
            continue
        if k.startswith("visual.") or k == "logit_scale":
            out[k] = v
        else:
            out[f"text.{k}"] = v
    return out


def load_openai_model(path: str, dtype=None, **kw):
    """Build (module, params) directly from an OpenAI checkpoint."""
    import jax.numpy as jnp

    from clipself_tpu.models.factory import create_model
    from clipself_tpu.models.torch_io import import_state_dict

    sd = load_openai_state_dict(path)
    cfg = config_from_openai_state_dict(sd)
    model, params = create_model(cfg, dtype=dtype or jnp.bfloat16, **kw)
    params = import_state_dict(remap_openai_keys(sd), params, cfg)
    return model, params
