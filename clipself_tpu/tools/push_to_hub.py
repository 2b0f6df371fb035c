"""Publish a trained checkpoint to the Hugging Face Hub.

Equivalent of the reference's `src/open_clip/push_to_hf_hub.py` weight
publisher: packages the (ensembled) params in the PyTorch reference layout
plus the model config JSON and a generated model card, then uploads the
folder. Upload requires network + `huggingface_hub` login; the packaging
step works offline and is what tests cover.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
from typing import Optional


def package_checkpoint(
    out_dir: str,
    params,
    cfg,
    model_card: Optional[str] = None,
) -> list[str]:
    """Write {pytorch_model.pt, open_clip_config.json, README.md} to out_dir."""
    from clipself_tpu.models.torch_io import save_torch_checkpoint

    os.makedirs(out_dir, exist_ok=True)
    ckpt = os.path.join(out_dir, "pytorch_model.pt")
    save_torch_checkpoint(ckpt, params, cfg)
    cfg_path = os.path.join(out_dir, "open_clip_config.json")
    with open(cfg_path, "w") as f:
        json.dump({"model_cfg": _openclip_model_cfg(cfg)}, f, indent=2)
    card_path = os.path.join(out_dir, "README.md")
    with open(card_path, "w") as f:
        f.write(model_card or _default_card(cfg))
    return [ckpt, cfg_path, card_path]


def _openclip_model_cfg(cfg) -> dict:
    """Reference-format model config (loadable by open_clip's factory):
    only CLIPVisionCfg/CLIPTextCfg keys, RN layer tuples restored,
    quick_gelu at the top level — a raw dataclasses.asdict would leak
    clipself_tpu-only fields that `CLIPVisionCfg(**cfg)` rejects."""
    v, t = cfg.vision, cfg.text
    vision = {
        "image_size": v.image_size,
        "layers": list(v.resnet_layers) if v.resnet_layers else v.layers,
        "width": v.width,
        "head_width": v.head_width,
        "patch_size": v.patch_size,
        "mlp_ratio": v.mlp_ratio,
    }
    if v.ls_init_value is not None:
        vision["ls_init_value"] = v.ls_init_value
    if v.patch_dropout:
        vision["patch_dropout"] = v.patch_dropout
    # EVA-family knobs (the eva_clip config format carries these same keys)
    for k in (
        "rope", "intp_freq", "naiveswiglu", "subln", "xattn", "fusedLN",
        "pt_hw_seq_len", "drop_path_rate", "eva_model_name",
    ):
        val = getattr(v, k, None)
        if val:
            vision[k] = val
    if t.hf_model_name:
        text = {
            "hf_model_name": t.hf_model_name,
            "hf_tokenizer_name": t.hf_tokenizer_name or t.hf_model_name,
            "pooler_type": t.pooler_type,
            "proj": t.proj,
        }
    else:
        text = {
            "context_length": t.context_length,
            "vocab_size": t.vocab_size,
            "width": t.width,
            "heads": t.heads,
            "layers": t.layers,
        }
        if t.ls_init_value is not None:
            text["ls_init_value"] = t.ls_init_value
    out = {"embed_dim": cfg.embed_dim, "vision_cfg": vision, "text_cfg": text}
    if getattr(v, "quick_gelu", False):
        out["quick_gelu"] = True
    return out


def _default_card(cfg) -> str:
    return (
        "---\ntags:\n- clip\n- zero-shot-image-classification\n"
        "library_name: clipself_tpu\n---\n"
        f"# {cfg.name or 'CLIP model'}\n\n"
        "CLIP checkpoint trained/distilled with the clipself_tpu framework "
        "(JAX/TPU). Weights are stored in the OpenCLIP-compatible PyTorch "
        "layout (`pytorch_model.pt`).\n"
    )


def push_to_hub(
    repo_id: str,
    params,
    cfg,
    token: Optional[str] = None,
    private: bool = False,
    commit_message: str = "Upload clipself_tpu checkpoint",
):
    """Package + upload. Requires network access and hub credentials."""
    from huggingface_hub import HfApi

    api = HfApi(token=token)
    api.create_repo(repo_id, private=private, exist_ok=True)
    with tempfile.TemporaryDirectory() as d:
        package_checkpoint(d, params, cfg)
        api.upload_folder(repo_id=repo_id, folder_path=d, commit_message=commit_message)


def main(argv=None):
    import jax.numpy as jnp

    p = argparse.ArgumentParser("push-to-hub")
    p.add_argument("--model", required=True)
    p.add_argument("--checkpoint", required=True, help="orbax dir or torch .pt")
    p.add_argument("--repo-id", required=True)
    p.add_argument("--private", action="store_true")
    p.add_argument("--package-only", default=None, help="write files here, skip upload")
    args = p.parse_args(argv)

    from clipself_tpu.models.factory import create_model

    model, params = create_model(args.model, dtype=jnp.float32, pretrained=args.checkpoint)
    from clipself_tpu.core.config import get_model_config

    cfg = get_model_config(args.model)
    if args.package_only:
        files = package_checkpoint(args.package_only, params, cfg)
        print("\n".join(files))
    else:
        push_to_hub(args.repo_id, params, cfg, private=args.private)


if __name__ == "__main__":
    main()
