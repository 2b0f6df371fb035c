"""Prompt-ensemble text embedding generation (ViLD templates).

Reproduces `tools/generate_text_embeddings.py` from the reference: for each
category, format the 60+ ViLD templates (with the "This is " prefix rule),
encode with the text tower, L2-normalize per prompt, average, re-normalize,
and save ordered by category id. The template strings are ViLD's public
prompt set (data, not code).

CLI:
  python -m clipself_tpu.tools.text_embeddings \
      --model EVA02-CLIP-B-16 --pretrained ckpt.pt \
      --ann panoptic_val2017.json --out embeddings.npy
"""

from __future__ import annotations

import argparse
import json

import numpy as np

VILD_TEMPLATES = [
    "There is {article} {} in the scene.",
    "There is the {} in the scene.",
    "a photo of {article} {} in the scene.",
    "a photo of the {} in the scene.",
    "a photo of one {} in the scene.",
    "itap of {article} {}.",
    "itap of my {}.",
    "itap of the {}.",
    "a photo of {article} {}.",
    "a photo of my {}.",
    "a photo of the {}.",
    "a photo of one {}.",
    "a photo of many {}.",
    "a good photo of {article} {}.",
    "a good photo of the {}.",
    "a bad photo of {article} {}.",
    "a bad photo of the {}.",
    "a photo of a nice {}.",
    "a photo of the nice {}.",
    "a photo of a cool {}.",
    "a photo of the cool {}.",
    "a photo of a weird {}.",
    "a photo of the weird {}.",
    "a photo of a small {}.",
    "a photo of the small {}.",
    "a photo of a large {}.",
    "a photo of the large {}.",
    "a photo of a clean {}.",
    "a photo of the clean {}.",
    "a photo of a dirty {}.",
    "a photo of the dirty {}.",
    "a bright photo of {article} {}.",
    "a bright photo of the {}.",
    "a dark photo of {article} {}.",
    "a dark photo of the {}.",
    "a photo of a hard to see {}.",
    "a photo of the hard to see {}.",
    "a low resolution photo of {article} {}.",
    "a low resolution photo of the {}.",
    "a cropped photo of {article} {}.",
    "a cropped photo of the {}.",
    "a close-up photo of {article} {}.",
    "a close-up photo of the {}.",
    "a jpeg corrupted photo of {article} {}.",
    "a jpeg corrupted photo of the {}.",
    "a blurry photo of {article} {}.",
    "a blurry photo of the {}.",
    "a pixelated photo of {article} {}.",
    "a pixelated photo of the {}.",
    "a black and white photo of the {}.",
    "a black and white photo of {article} {}.",
    "a plastic {}.",
    "the plastic {}.",
    "a toy {}.",
    "the toy {}.",
    "a plushie {}.",
    "the plushie {}.",
    "a cartoon {}.",
    "the cartoon {}.",
    "an embroidered {}.",
    "the embroidered {}.",
    "a painting of the {}.",
    "a painting of a {}.",
]

SINGLE_TEMPLATE = ["a photo of {article} {}."]


def article(name: str) -> str:
    return "an" if name[0] in "aeiou" else "a"


def processed_name(name: str, rm_dot: bool = False) -> str:
    res = name.replace("_", " ").replace("/", " or ").lower()
    if rm_dot:
        res = res.rstrip(".")
    return res


def category_prompts(category: str, templates=None) -> list[str]:
    templates = templates or VILD_TEMPLATES
    texts = [
        t.format(processed_name(category, rm_dot=True), article=article(category))
        for t in templates
    ]
    return [
        "This is " + t if t.startswith("a") or t.startswith("the") else t for t in texts
    ]


def build_text_embeddings(
    model, params, categories: list[str], templates=None, batch_size: int = 64
) -> np.ndarray:
    """[num_categories, embed_dim] prompt-ensemble embeddings
    (per-prompt L2 norm -> mean -> L2 norm)."""
    import jax
    import jax.numpy as jnp

    from clipself_tpu.models.factory import get_tokenizer

    # routes to the model's tokenizer (HF or CLIP BPE) at its context length
    tokenizer = get_tokenizer(getattr(model, "cfg", None))

    @jax.jit
    def encode(tokens):
        return model.apply({"params": params}, tokens, True, method="encode_text")

    out = []
    for cat in categories:
        prompts = category_prompts(cat, templates)
        tokens = tokenizer(prompts)
        embs = []
        for i in range(0, len(tokens), batch_size):
            embs.append(np.asarray(encode(jnp.asarray(tokens[i : i + batch_size]))))
        emb = np.concatenate(embs).astype(np.float32)
        mean = emb.mean(0)
        out.append(mean / (np.linalg.norm(mean) + 1e-12))
    return np.stack(out)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="EVA02-CLIP-B-16")
    parser.add_argument("--pretrained", default=None)
    parser.add_argument("--ann", default=None, help="COCO-style JSON with categories")
    parser.add_argument(
        "--classes-json", default=None,
        help="plain JSON list of class names (e.g. detector metadata lists)",
    )
    parser.add_argument(
        "--add-background", action="store_true",
        help="append a 'background' embedding row (detector class matrices, "
        "reference F-ViT/tools/dump_coco_openclip_feature.py:20-22)",
    )
    parser.add_argument("--out", required=True, help="output .npy path")
    args = parser.parse_args()

    import jax.numpy as jnp

    from clipself_tpu.models.factory import create_model

    model, params = create_model(args.model, dtype=jnp.float32, pretrained=args.pretrained)
    if args.classes_json:
        with open(args.classes_json) as f:
            cats = json.load(f)
    elif args.ann:
        with open(args.ann) as f:
            data = json.load(f)
        cats = [c["name"] for c in sorted(data["categories"], key=lambda c: c["id"])]
    else:
        parser.error("one of --ann / --classes-json is required")
    if args.add_background:
        cats = list(cats) + ["background"]
    emb = build_text_embeddings(model, params, cats)
    np.save(args.out, emb)
    print(f"saved {emb.shape} embeddings to {args.out}")


if __name__ == "__main__":
    main()
