"""Pretrained-weight catalog + download/resolution helpers.

TPU-native re-design of the reference registry
(`src/open_clip/pretrained.py:21-376` and
`src/open_clip/eva_clip/pretrained.py`): a catalog mapping
(model name, tag) -> source (direct URL or HF-hub repo) plus resolution
helpers. Downloads go through `huggingface_hub` when available and fall back
to `urllib`; everything degrades gracefully to local paths in air-gapped
environments (a local file path is always a valid "pretrained" value).

Only weights whose architectures this framework implements are cataloged
(EVA02 ViTs, OpenCLIP ViTs, CLIP ResNets); the loaders in
`clipself_tpu.models.torch_io` handle the state-dict mapping.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional


def _cfg(url: str = "", hf_hub: str = "", filename: str = "") -> dict:
    return {"url": url, "hf_hub": hf_hub, "filename": filename}


_OPENAI_ROOT = "https://openaipublic.azureedge.net/clip/models"

PRETRAINED = {
    "EVA02-CLIP-B-16": {
        "eva": _cfg(hf_hub="QuanSun/EVA-CLIP", filename="EVA02_CLIP_B_psz16_s8B.pt"),
        "eva02": _cfg(hf_hub="QuanSun/EVA-CLIP", filename="EVA02_CLIP_B_psz16_s8B.pt"),
    },
    "EVA02-CLIP-L-14-336": {
        "eva": _cfg(hf_hub="QuanSun/EVA-CLIP", filename="EVA02_CLIP_L_336_psz14_s6B.pt"),
        "eva02": _cfg(hf_hub="QuanSun/EVA-CLIP", filename="EVA02_CLIP_L_336_psz14_s6B.pt"),
    },
    "EVA02-CLIP-L-14": {
        "eva": _cfg(hf_hub="QuanSun/EVA-CLIP", filename="EVA02_CLIP_L_psz14_s4B.pt"),
    },
    "EVA01-CLIP-g-14": {
        "eva": _cfg(hf_hub="QuanSun/EVA-CLIP", filename="EVA01_CLIP_g_14_psz14_s11B.pt"),
    },
    "ViT-B-32": {
        "openai": _cfg(
            url=f"{_OPENAI_ROOT}/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt"
        ),
        "laion2b_s34b_b79k": _cfg(hf_hub="laion/CLIP-ViT-B-32-laion2B-s34B-b79K"),
    },
    "ViT-B-16": {
        "openai": _cfg(
            url=f"{_OPENAI_ROOT}/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt"
        ),
        "laion2b_s34b_b88k": _cfg(hf_hub="laion/CLIP-ViT-B-16-laion2B-s34B-b88K"),
    },
    "ViT-L-14": {
        "openai": _cfg(
            url=f"{_OPENAI_ROOT}/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt"
        ),
        "laion2b_s32b_b82k": _cfg(hf_hub="laion/CLIP-ViT-L-14-laion2B-s32B-b82K"),
    },
    "ViT-L-14-336": {
        "openai": _cfg(
            url=f"{_OPENAI_ROOT}/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt"
        ),
    },
    "RN50": {
        "openai": _cfg(
            url=f"{_OPENAI_ROOT}/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt"
        ),
    },
    "RN101": {
        "openai": _cfg(
            url=f"{_OPENAI_ROOT}/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt"
        ),
    },
}


def list_pretrained() -> list[tuple[str, str]]:
    return [(m, t) for m, tags in PRETRAINED.items() for t in tags]


def list_pretrained_tags_by_model(model: str) -> list[str]:
    return list(PRETRAINED.get(model, {}))


def get_pretrained_cfg(model: str, tag: str) -> Optional[dict]:
    return PRETRAINED.get(model, {}).get(tag.lower())


def default_cache_dir() -> Path:
    return Path(os.environ.get("CLIPSELF_CACHE", Path.home() / ".cache" / "clipself_tpu"))


def download_pretrained(
    cfg: dict, cache_dir: Optional[str] = None
) -> str:
    """Resolve a catalog entry to a local file, downloading if needed."""
    cache = Path(cache_dir) if cache_dir else default_cache_dir()
    cache.mkdir(parents=True, exist_ok=True)
    if cfg.get("hf_hub"):
        from huggingface_hub import hf_hub_download

        filename = cfg.get("filename") or "open_clip_pytorch_model.bin"
        return hf_hub_download(cfg["hf_hub"], filename, cache_dir=str(cache))
    url = cfg["url"]
    target = cache / url.split("/")[-1]
    if not target.exists():
        import urllib.request

        urllib.request.urlretrieve(url, target)  # nosec - catalog URLs only
    return str(target)


def resolve_pretrained(
    model: str, pretrained: str, cache_dir: Optional[str] = None
) -> str:
    """Map a `pretrained` value to a local checkpoint path.

    Accepts a local path verbatim (the common air-gapped case, and the
    reference's `--cache-dir`-as-checkpoint-path quirk, `factory.py:145-149`)
    or a catalog tag to fetch.
    """
    if os.path.exists(pretrained):
        return pretrained
    cfg = get_pretrained_cfg(model, pretrained)
    if cfg is None:
        raise FileNotFoundError(
            f"'{pretrained}' is neither a local path nor a known tag for {model}; "
            f"known tags: {list_pretrained_tags_by_model(model)}"
        )
    return download_pretrained(cfg, cache_dir)
