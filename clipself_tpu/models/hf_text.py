"""HuggingFace text towers for CLIP (roberta/mT5-style text encoders).

Equivalent of the reference `src/open_clip/hf_model.py:83-176`
(`HFTextEncoder`: AutoModel trunk + {mean, cls, last-token} pooling + a
linear/MLP projection into the CLIP joint space), rebuilt on transformers'
Flax model classes so the whole tower stays inside one jitted graph.

Gated: environments without Flax-transformers support raise a clear error at
construction, not import.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _hf_flax_module(model_name_or_config, hf_config_kwargs: Optional[dict] = None):
    try:
        from transformers import AutoConfig, FlaxAutoModel
    except Exception as e:  # pragma: no cover
        raise RuntimeError(
            "transformers with Flax support is required for HF text towers"
        ) from e
    if isinstance(model_name_or_config, str):
        from transformers import CONFIG_MAPPING

        # deterministic routing: an exact model-TYPE key ("roberta", "bert",
        # "gpt2") builds an offline default config; anything else is treated
        # as a hub checkpoint id ("roberta-base", "google/mt5-base"). Use the
        # full checkpoint id when the hub config matters.
        if model_name_or_config in CONFIG_MAPPING:
            cfg = AutoConfig.for_model(model_name_or_config, **(hf_config_kwargs or {}))
        else:
            cfg = AutoConfig.from_pretrained(model_name_or_config, **(hf_config_kwargs or {}))
    else:
        cfg = model_name_or_config
    # _do_init=False: we only need the Flax module definition — eager init
    # would materialize (and discard) the full trunk's random weights on
    # every setup/trace
    if getattr(cfg, "is_encoder_decoder", False):
        # seq2seq trunks (mT5): use the ENCODER-only model class — the full
        # module would demand decoder_input_ids and return decoder states
        # (reference `hf_model.py:111-113` takes .encoder the same way)
        import transformers as _t

        name = {"t5": "FlaxT5EncoderModel", "mt5": "FlaxMT5EncoderModel"}.get(
            cfg.model_type
        )
        if name is None:
            raise NotImplementedError(
                f"no Flax encoder-only class known for {cfg.model_type!r}"
            )
        wrapper = getattr(_t, name)._from_config(cfg, _do_init=False)
    else:
        wrapper = FlaxAutoModel.from_config(cfg, _do_init=False)
    return wrapper.module, cfg


class MeanPooler(nn.Module):
    """Masked mean over tokens (reference `hf_model.py:30-38`)."""

    @nn.compact
    def __call__(self, out, attention_mask):
        hidden = out.last_hidden_state
        m = attention_mask[..., None].astype(hidden.dtype)
        return (hidden * m).sum(1) / jnp.maximum(m.sum(1), 1e-6)


class ClsPooler(nn.Module):
    """Trained pooler head when the trunk has one, else raw CLS (reference
    `hf_model.py` ClsPooler with use_pooler_output=True)."""

    @nn.compact
    def __call__(self, out, attention_mask):
        pooled = getattr(out, "pooler_output", None)
        if pooled is not None:
            return pooled
        return out.last_hidden_state[:, 0]


class LastPooler(nn.Module):
    """Feature of the last non-padding token."""

    @nn.compact
    def __call__(self, out, attention_mask):
        hidden = out.last_hidden_state
        idx = jnp.maximum(attention_mask.sum(1) - 1, 0).astype(jnp.int32)
        return jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]


_POOLERS = {"mean_pooler": MeanPooler, "cls_pooler": ClsPooler, "last_pooler": LastPooler}


class HFTextTower(nn.Module):
    """AutoModel trunk + pooler + projection into the joint space."""

    model_type_or_name: str
    output_dim: int
    pooler_type: str = "mean_pooler"
    proj: str = "linear"  # 'linear' | 'mlp'
    hf_config_kwargs: Optional[dict] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        self.trunk, self.hf_config = _hf_flax_module(
            self.model_type_or_name, self.hf_config_kwargs
        )
        self.pooler = _POOLERS[self.pooler_type](name="pooler")
        width = getattr(self.hf_config, "hidden_size", None) or self.hf_config.d_model
        if self.proj == "linear":
            self.projection = nn.Dense(
                self.output_dim, use_bias=False, dtype=self.dtype,
                param_dtype=jnp.float32, name="proj",
            )
        elif self.proj == "mlp":
            hidden = (width + self.output_dim) // 2
            self.projection = nn.Sequential(
                [
                    nn.Dense(hidden, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32),
                    nn.gelu,
                    nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32),
                ],
                name="proj",
            )
        else:
            raise ValueError(f"unknown proj {self.proj!r}")

    # model types whose positions start at padding_idx+1 and skip pad slots
    # (fairseq convention; the transformers *wrapper* classes compute this,
    # but we call the raw Flax module, whose default is a plain arange)
    _PAD_OFFSET_POSITIONS = ("roberta", "roberta-prelayernorm", "xlm-roberta")

    def __call__(self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None):
        if attention_mask is None:
            # mask against the trunk's own pad id (reference `hf_model.py:138`
            # uses config.pad_token_id); RoBERTa-family pads with 1, not 0
            pad_id = getattr(self.hf_config, "pad_token_id", None)
            attention_mask = (input_ids != (0 if pad_id is None else pad_id)).astype(jnp.int32)
        kwargs = {}
        if getattr(self.hf_config, "model_type", None) in self._PAD_OFFSET_POSITIONS:
            pad_id = getattr(self.hf_config, "pad_token_id", None)
            pad_id = 0 if pad_id is None else pad_id
            pad_mask = (input_ids != pad_id).astype(jnp.int32)
            kwargs["position_ids"] = jnp.cumsum(pad_mask, axis=1) * pad_mask + pad_id
        out = self.trunk(input_ids=input_ids, attention_mask=attention_mask, **kwargs)
        pooled = self.pooler(out, attention_mask)
        return self.projection(pooled)

    def forward_tokens(self, input_ids: jnp.ndarray):
        """(projected pooled, per-token hidden states) — the reference
        output_tokens path (`src/open_clip/hf_model.py:137-153`): tokens are
        the trunk's last hidden state, with the CLS slot dropped when the
        pooler is a ClsPooler. Used by CoCa's multimodal decoder."""
        pad_id = getattr(self.hf_config, "pad_token_id", None)
        attention_mask = (input_ids != (0 if pad_id is None else pad_id)).astype(jnp.int32)
        kwargs = {}
        if getattr(self.hf_config, "model_type", None) in self._PAD_OFFSET_POSITIONS:
            p = 0 if pad_id is None else pad_id
            pad_mask = (input_ids != p).astype(jnp.int32)
            kwargs["position_ids"] = jnp.cumsum(pad_mask, axis=1) * pad_mask + p
        out = self.trunk(input_ids=input_ids, attention_mask=attention_mask, **kwargs)
        pooled = self.projection(self.pooler(out, attention_mask))
        hidden = out.last_hidden_state
        if isinstance(self.pooler, ClsPooler):
            hidden = hidden[:, 1:]
        return pooled, hidden


def load_hf_trunk_params(clip_params, hf_trunk_params):
    """Graft pretrained HF trunk weights into a CLIP param tree.

    The tower's `trunk` submodule has exactly the FlaxAutoModel param
    structure, so the graft is a subtree swap (with a structure check).
    Returns a new params tree; pooler/projection params are untouched.
    """
    import jax

    text = dict(clip_params["text"])
    ours = jax.tree_util.tree_structure(text["trunk"])
    theirs = jax.tree_util.tree_structure(hf_trunk_params)
    if ours != theirs:
        raise ValueError(
            f"HF trunk param structure mismatch: model has {ours}, "
            f"checkpoint has {theirs}"
        )
    import jax.numpy as jnp

    text["trunk"] = jax.tree.map(
        lambda ref, new: jnp.asarray(new, ref.dtype), text["trunk"], hf_trunk_params
    )
    out = dict(clip_params)
    out["text"] = text
    return out


def load_hf_pretrained(clip_params, model_name: str):
    """Fetch `model_name`'s weights from the HuggingFace hub (or local cache)
    and graft them into the text trunk (reference `hf_model.py` loads hub
    weights by default via `pretrained_hf=True`). Requires network or a
    populated HF cache."""
    from transformers import FlaxAutoModel

    wrapper = FlaxAutoModel.from_pretrained(model_name)
    return load_hf_trunk_params(clip_params, wrapper.params)
