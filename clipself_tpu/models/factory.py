"""Model creation: config registry -> Flax module + initialized params.

TPU-native replacement for the reference factories
(`src/open_clip/factory.py:111-249`, `src/open_clip/eva_clip/factory.py:211-355`):
a pure function returning (module, params). Pretrained weights load through
`clipself_tpu.models.torch_io` (PyTorch `.pt` interop) or Orbax checkpoints.
"""

from __future__ import annotations

from typing import Any, Optional

import os

import jax
import jax.numpy as jnp

from clipself_tpu.core.config import CLIPConfig, get_model_config
from clipself_tpu.models.clip import CLIP


def _load_orbax_params(ckpt_dir, params):
    """Restore the ensembled "params" payload from an Orbax checkpoint
    directory (a trainer run dir `.../checkpoints`, or one step dir)."""
    import jax

    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    try:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint steps under {ckpt_dir}")
        restored = mgr.restore(step)
    finally:
        mgr.close()
    tree = restored.get("params", restored)
    ours = jax.tree_util.tree_structure(params)
    theirs = jax.tree_util.tree_structure(tree)
    if ours != theirs:
        raise ValueError(
            f"checkpoint param structure under {ckpt_dir} does not match the "
            f"model: {theirs} vs {ours}"
        )
    return jax.tree.map(lambda ref, new: jnp.asarray(new, ref.dtype), params, tree)


def create_model(
    name_or_cfg: str | CLIPConfig,
    *,
    dtype: Any = jnp.bfloat16,
    attn_impl: str = "auto",
    remat: bool = False,
    pretrained: Optional[str] = None,
    seed: int = 0,
    init: bool = True,
    hf_pretrained: bool = False,
):
    """Build a CLIP module and (optionally) its parameters.

    Args:
      name_or_cfg: registry name (e.g. 'EVA02-CLIP-B-16') or a CLIPConfig.
      dtype: activation/compute dtype (params are always float32).
      pretrained: path to a PyTorch `.pt` checkpoint (EVA format) or an Orbax
        checkpoint directory; positional embeddings are resized on load.
      init: if False, return (module, None) without initializing params.
      hf_pretrained: for configs with an HF text tower, fetch the trunk's hub
        weights and graft them in (the reference loads them by default,
        `hf_model.py` pretrained_hf=True; opt-in here because it needs
        network/cache — a warning is logged when skipped).

    Returns:
      (module, params) — params is a FrozenDict pytree or None.
    """
    cfg = get_model_config(name_or_cfg) if isinstance(name_or_cfg, str) else name_or_cfg
    if cfg.multimodal is not None:
        # a multimodal decoder config makes the model a CoCa (reference
        # `src/open_clip/factory.py:215-230` keys on "multimodal_cfg")
        from clipself_tpu.models.coca import CoCa

        model = CoCa(cfg, dtype=dtype, attn_impl=attn_impl, remat=remat)
        txt_len = cfg.text.context_length + 1  # embed_cls truncates by one
    else:
        model = CLIP(cfg, dtype=dtype, attn_impl=attn_impl, remat=remat)
        txt_len = cfg.text.context_length
    if not init and pretrained is None:
        return model, None

    def _init():
        rng = jax.random.PRNGKey(seed)
        img = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3), dtype)
        txt = jnp.zeros((1, txt_len), jnp.int32)
        return model.init(rng, img, txt)["params"]

    params = jax.eval_shape(_init) if pretrained else jax.jit(_init)()

    if pretrained:
        import os

        if os.path.isdir(pretrained):
            # Orbax run/step directory from our own trainer: graft the saved
            # (ensembled) "params" payload
            params = _load_orbax_params(pretrained, params)
        else:
            from clipself_tpu.models.pretrained import resolve_pretrained
            from clipself_tpu.models.torch_io import load_pretrained

            # catalog tags ('eva02', 'openai', ...) resolve/download here;
            # existing local paths pass through verbatim
            path = resolve_pretrained(cfg.name, pretrained)
            params = load_pretrained(path, params, cfg)
    if cfg.vision.timm_model_name and cfg.vision.timm_model_pretrained and not pretrained:
        # the reference's --pretrained-image pulls the trunk's timm hub
        # weights; offline we can only honor an explicit checkpoint path
        import logging

        logging.getLogger("clipself_tpu").warning(
            "timm_model_pretrained is set but no weights source is reachable "
            "offline; pass --pretrained <checkpoint> to load trunk weights"
        )
    if cfg.text.hf_model_name:
        if hf_pretrained:
            from clipself_tpu.models.hf_text import load_hf_pretrained

            params = load_hf_pretrained(params, cfg.text.hf_model_name)
        else:
            import logging

            logging.getLogger("clipself_tpu").warning(
                "HF text tower %r is randomly initialized; pass "
                "hf_pretrained=True to load its hub weights",
                cfg.text.hf_model_name,
            )
    if pretrained:
        # the checkpoint path starts from eval_shape (no wasted init); any
        # leaf the checkpoint did not cover is still abstract — materialize
        # those from a real init so strict=False semantics hold
        leaves = jax.tree.leaves(params)
        if any(isinstance(x, jax.ShapeDtypeStruct) for x in leaves):
            real = jax.jit(_init)()
            params = jax.tree.map(
                lambda a, b: b if isinstance(a, jax.ShapeDtypeStruct) else a,
                params, real,
            )
    return model, params


def get_tokenizer(name_or_cfg: Any = None):
    """Return the tokenizer callable for a model (reference
    `src/open_clip/factory.py:77-87`): models with an HF text tower get the
    matching `HFTokenizer`; everything else gets the CLIP BPE `tokenize`."""
    from clipself_tpu import tokenizer as _tok

    if name_or_cfg is None:
        return _tok.tokenize
    cfg = get_model_config(name_or_cfg) if isinstance(name_or_cfg, str) else name_or_cfg
    hf_name = cfg.text.hf_tokenizer_name or cfg.text.hf_model_name
    if hf_name:
        return _tok.HFTokenizer(hf_name)
    import functools

    # CoCa configs declare context_length=76 but consume 77 tokens (the
    # model truncates one slot for the CLS embed; the reference uses the
    # default 77-token `tokenize` for them)
    ctx = cfg.text.context_length + (1 if cfg.multimodal is not None else 0)
    return functools.partial(_tok.tokenize, context_length=ctx)


def create_model_and_transforms(
    name_or_cfg,
    dtype=jnp.bfloat16,
    pretrained: Optional[str] = None,
    det_image_size: int = 1024,
    dataset_type: str = "grid_distill",
    **kwargs,
):
    """Model plus the (det, crop) preprocessing pair — the reference's main
    entry point (`src/open_clip/factory.py:267-350`): for the distill /
    region_clip dataset types both the train and val preprocess are
    ``[det_transform(det_image_size), crop_transform(visual.image_size)]``
    (ResizeLongest+pad-to-square, and ResizeLongest-max center pad).

    Returns (model, params, preprocess_train, preprocess_val); each
    preprocess is a list of two callables taking a PIL image to a CHW-free
    [H, W, 3] float32 array (TPU layout is channels-last by design).
    """
    import functools

    from clipself_tpu.data.transforms import crop_transform, det_transform

    model, params = create_model(
        name_or_cfg, dtype=dtype, pretrained=pretrained, **kwargs
    )
    pre_det = functools.partial(det_transform, det_size=det_image_size)
    pre_crop = functools.partial(crop_transform, crop_size=model.cfg.vision.image_size)
    pair = [pre_det, pre_crop]
    if dataset_type in ("grid_distill", "proposals_distill", "region_clip",
                        "clipself", "clipself_proposals"):
        return model, params, pair, pair
    return model, params, pre_crop, pair
