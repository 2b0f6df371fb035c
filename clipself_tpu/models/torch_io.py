"""PyTorch checkpoint interop: import EVA `.pt` weights into Flax params and
export Flax params back to the reference's PyTorch state-dict layout.

Import semantics follow the reference loader's probing rules
(`src/open_clip/eva_clip/factory.py:80-129`): unwrap `state_dict|model|module`
containers, strip `module.` prefixes, drop RoPE frequency buffers (we
recompute them analytically), and bicubic-resize absolute positional
embeddings when the checkpoint grid differs from the model grid.

The export path produces a state dict keyed exactly like the reference's
`CustomCLIP`, so distilled checkpoints remain consumable by the PyTorch
F-ViT stack.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

from clipself_tpu.core.config import CLIPConfig
from clipself_tpu.ops.interpolate import resize_weight_matrix


# ---------------------------------------------------------------------------
# key mapping


def _vision_key_map(flax_key: tuple[str, ...], cfg: CLIPConfig):
    """Map a flax param path under `visual` to (torch_key, transform).

    transform: 'linear' (transpose 2D), 'conv' (OIHW->HWIO), None (verbatim).
    """
    k = list(flax_key)
    tm = cfg.vision.timm_model_name or ""
    # --- Swin tower (classic timm swin state-dict layout: the MSR
    # checkpoints and HF conversion sources; see models/swin.py) ---
    if tm.startswith("swin") and k[0] == "trunk":
        rest = k[1:]
        ln = {"scale": "weight", "bias": "bias"}
        if rest[0] == "patch_embed_conv":
            t = "conv" if rest[1] == "kernel" else None
            return f"visual.trunk.patch_embed.proj.{'weight' if t else 'bias'}", t
        if rest[0] == "patch_embed_norm":
            return f"visual.trunk.patch_embed.norm.{ln[rest[1]]}", None
        if rest[0] == "norm":
            return f"visual.trunk.norm.{ln[rest[1]]}", None
        m = re.fullmatch(r"downsample_norm_(\d+)", rest[0])
        if m:
            return f"visual.trunk.layers.{m.group(1)}.downsample.norm.{ln[rest[1]]}", None
        m = re.fullmatch(r"downsample_reduction_(\d+)", rest[0])
        if m:
            return f"visual.trunk.layers.{m.group(1)}.downsample.reduction.weight", "linear"
        m = re.fullmatch(r"layer(\d+)_block(\d+)", rest[0])
        if m:
            base = f"visual.trunk.layers.{m.group(1)}.blocks.{m.group(2)}"
            sub = rest[1:]
            if sub[0] in ("norm1", "norm2"):
                return f"{base}.{sub[0]}.{ln[sub[1]]}", None
            if sub[0] == "attn_qkv":
                t = "linear" if sub[1] == "kernel" else None
                return f"{base}.attn.qkv.{'weight' if t else 'bias'}", t
            if sub == ["rel_pos_table"]:
                return f"{base}.attn.relative_position_bias_table", None
            if sub[0] == "attn_proj":
                t = "linear" if sub[1] == "kernel" else None
                return f"{base}.attn.proj.{'weight' if t else 'bias'}", t
            if sub[0] in ("mlp_fc1", "mlp_fc2"):
                fc = "fc1" if sub[0] == "mlp_fc1" else "fc2"
                t = "linear" if sub[1] == "kernel" else None
                return f"{base}.mlp.{fc}.{'weight' if t else 'bias'}", t
    # --- timm plain-ViT tower (vit_relpos/vit_gap layout; models/timm_vit.py) ---
    if tm.startswith("vit_"):
        ln = {"scale": "weight", "bias": "bias"}
        if k[0] == "patch_embed_conv":
            t = "conv" if k[1] == "kernel" else None
            return f"visual.trunk.patch_embed.proj.{'weight' if t else 'bias'}", t
        if k == ["cls_token"]:
            return "visual.trunk.cls_token", None
        if k == ["pos_embed"]:
            return "visual.trunk.pos_embed", None
        if k[0] in ("norm", "fc_norm") and len(k) == 2:
            return f"visual.trunk.{k[0]}.{ln[k[1]]}", None
        m = re.fullmatch(r"block(\d+)", k[0])
        if m:
            base = f"visual.trunk.blocks.{m.group(1)}"
            sub = k[1:]
            if sub[0] in ("norm1", "norm2"):
                return f"{base}.{sub[0]}.{ln[sub[1]]}", None
            if sub[0] == "attn_qkv":
                t = "linear" if sub[1] == "kernel" else None
                return f"{base}.attn.qkv.{'weight' if t else 'bias'}", t
            if sub[0] == "attn_proj":
                t = "linear" if sub[1] == "kernel" else None
                return f"{base}.attn.proj.{'weight' if t else 'bias'}", t
            if sub[0] in ("mlp_fc1", "mlp_fc2"):
                fc = "fc1" if sub[0] == "mlp_fc1" else "fc2"
                t = "linear" if sub[1] == "kernel" else None
                return f"{base}.mlp.{fc}.{'weight' if t else 'bias'}", t
        m = re.fullmatch(r"rel_pos(\d+)", k[0])
        if m:
            # timm keeps the bias MLP on the attention module
            t = "linear" if k[2] == "kernel" else None
            return (
                f"visual.trunk.blocks.{m.group(1)}.attn.rel_pos.mlp."
                f"{k[1]}.{'weight' if t else 'bias'}", t,
            )
    if k == ["patch_embed", "kernel"]:
        return "visual.patch_embed.proj.weight", "conv"
    if k == ["patch_embed", "bias"]:
        return "visual.patch_embed.proj.bias", None
    if k == ["cls_token"]:
        return "visual.cls_token", None
    if k == ["pos_embed"]:
        return "visual.pos_embed", None
    if k == ["rel_pos_bias", "relative_position_bias_table"]:
        return "visual.rel_pos_bias.relative_position_bias_table", None
    if k == ["norm", "scale"]:
        return "visual.norm.weight", None
    if k == ["norm", "bias"]:
        return "visual.norm.bias", None
    if k == ["head", "kernel"]:
        return "visual.head.weight", "linear"
    if k == ["head", "bias"]:
        return "visual.head.bias", None
    # --- plain OpenCLIP ViT tower (visual.transformer.resblocks layout) ---
    if k == ["conv1", "kernel"]:
        return "visual.conv1.weight", "conv"
    if k == ["class_embedding"]:
        return "visual.class_embedding", None
    if k == ["positional_embedding"]:
        return "visual.positional_embedding", None
    if k == ["proj"]:
        return "visual.proj", None
    for ln_name in ("ln_pre", "ln_post"):
        if k == [ln_name, "scale"]:
            return f"visual.{ln_name}.weight", None
        if k == [ln_name, "bias"]:
            return f"visual.{ln_name}.bias", None
    m = re.match(r"resblocks_(\d+)", k[0])
    if m:
        i = m.group(1)
        rest = k[1:]
        base = f"visual.transformer.resblocks.{i}"
        ln = {"scale": "weight", "bias": "bias"}
        if rest[0] in ("ls_1", "ls_2"):
            return f"{base}.{rest[0]}.gamma", None
        if rest[0] in ("ln_1", "ln_2"):
            return f"{base}.{rest[0]}.{ln[rest[1]]}", None
        if rest[0] == "in_proj":
            if rest[1] == "kernel":
                return f"{base}.attn.in_proj_weight", "linear"
            return f"{base}.attn.in_proj_bias", None
        if rest[0] == "out_proj":
            t = "linear" if rest[1] == "kernel" else None
            return f"{base}.attn.out_proj.{'weight' if t else 'bias'}", t
        if rest[0] in ("c_fc", "c_proj"):
            t = "linear" if rest[1] == "kernel" else None
            return f"{base}.mlp.{rest[0]}.{'weight' if t else 'bias'}", t
    m = re.match(r"blocks_(\d+)", k[0])
    if m:
        i = m.group(1)
        rest = k[1:]
        base = f"visual.blocks.{i}"
        ln = {"scale": "weight", "bias": "bias"}
        if rest[0] in ("norm1", "norm2"):
            return f"{base}.{rest[0]}.{ln[rest[1]]}", None
        if rest[0] == "attn":
            sub = rest[1]
            if sub in ("q_proj", "k_proj", "v_proj"):
                if rest[2] == "kernel":
                    return f"{base}.attn.{sub}.weight", "linear"
                # torch stores q/v biases as standalone parameters
                return f"{base}.attn.{sub[0]}_bias", None
            if sub == "qkv":
                return f"{base}.attn.qkv.weight", "linear"
            if sub in ("q_bias", "v_bias"):
                return f"{base}.attn.{sub}", None
            if sub == "inner_attn_ln":
                return f"{base}.attn.inner_attn_ln.{ln[rest[2]]}", None
            if sub == "rel_pos_bias":
                # torch keeps the per-block table directly on the attention
                return f"{base}.attn.relative_position_bias_table", None
            if sub == "proj":
                t = "linear" if rest[2] == "kernel" else None
                return f"{base}.attn.proj.{'weight' if t else 'bias'}", t
        if rest[0] == "mlp":
            sub = rest[1]
            if sub == "ffn_ln":
                return f"{base}.mlp.ffn_ln.{ln[rest[2]]}", None
            t = "linear" if rest[2] == "kernel" else None
            return f"{base}.mlp.{sub}.{'weight' if t else 'bias'}", t
        if rest[0] in ("gamma_1", "gamma_2"):
            return f"{base}.{rest[0]}", None
    # --- ConvNeXt tower (timm state-dict layout used by the OpenCLIP
    # convnext hub checkpoints: visual.trunk.* + visual.head.*) ---
    ln = {"scale": "weight", "bias": "bias"}
    if k[0] == "trunk":
        rest = k[1:]
        if rest[0] == "stem_conv":
            return "visual.trunk.stem.0.weight" if rest[1] == "kernel" else "visual.trunk.stem.0.bias", (
                "conv" if rest[1] == "kernel" else None
            )
        if rest[0] == "stem_norm":
            return f"visual.trunk.stem.1.{ln[rest[1]]}", None
        m = re.fullmatch(r"downsample_norm_(\d+)", rest[0])
        if m:
            return f"visual.trunk.stages.{m.group(1)}.downsample.0.{ln[rest[1]]}", None
        m = re.fullmatch(r"downsample_conv_(\d+)", rest[0])
        if m:
            t = "conv" if rest[1] == "kernel" else None
            return f"visual.trunk.stages.{m.group(1)}.downsample.1.{'weight' if t else 'bias'}", t
        m = re.fullmatch(r"stage(\d+)_block(\d+)", rest[0])
        if m:
            base = f"visual.trunk.stages.{m.group(1)}.blocks.{m.group(2)}"
            sub = rest[1:]
            if sub[0] == "conv_dw":
                t = "conv" if sub[1] == "kernel" else None
                return f"{base}.conv_dw.{'weight' if t else 'bias'}", t
            if sub[0] == "norm":
                return f"{base}.norm.{ln[sub[1]]}", None
            if sub[0] in ("mlp_fc1", "mlp_fc2"):
                fc = "fc1" if sub[0] == "mlp_fc1" else "fc2"
                t = "linear" if sub[1] == "kernel" else None
                return f"{base}.mlp.{fc}.{'weight' if t else 'bias'}", t
            if sub == ["gamma"]:
                return f"{base}.gamma", None
    if k[0] == "head_norm":
        return f"visual.trunk.head.norm.{ln[k[1]]}", None
    if k[0] == "proj" and k[1] == "kernel":
        return "visual.head.proj.weight", "linear"
    if k[0] in ("proj_fc1", "proj_fc2"):
        fc = "fc1" if k[0] == "proj_fc1" else "fc2"
        t = "linear" if k[1] == "kernel" else None
        return f"visual.head.mlp.{fc}.{'weight' if t else 'bias'}", t
    # --- ModifiedResNet tower (visual.layer{s}.{i} torch layout) ---
    bn = {"scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}
    if re.fullmatch(r"conv[23]", k[0]) and k[1] == "kernel":
        return f"visual.{k[0]}.weight", "conv"
    if re.fullmatch(r"bn[123]", k[0]):
        return f"visual.{k[0]}.{bn[k[1]]}", None
    m = re.fullmatch(r"layer(\d+)_(\d+)", k[0])
    if m:
        base = f"visual.layer{m.group(1)}.{m.group(2)}"
        rest = k[1:]
        if re.fullmatch(r"conv[123]", rest[0]) and rest[1] == "kernel":
            return f"{base}.{rest[0]}.weight", "conv"
        if re.fullmatch(r"bn[123]", rest[0]):
            return f"{base}.{rest[0]}.{bn[rest[1]]}", None
        # CLIP's Bottleneck downsample = Sequential(avgpool, conv '0', bn '1')
        if rest[0] == "downsample_conv" and rest[1] == "kernel":
            return f"{base}.downsample.0.weight", "conv"
        if rest[0] == "downsample_bn":
            return f"{base}.downsample.1.{bn[rest[1]]}", None
    if k[0] == "attnpool":
        rest = k[1:]
        if rest == ["positional_embedding"]:
            return "visual.attnpool.positional_embedding", None
        if rest[0] in ("q_proj", "k_proj", "v_proj", "c_proj"):
            t = "linear" if rest[1] == "kernel" else None
            return f"visual.attnpool.{rest[0]}.{'weight' if t else 'bias'}", t
    # --- CoCa attentional pooler (torch nn.MultiheadAttention with
    # kdim != embed_dim: separate q/k/v proj weights, one packed bias) ---
    if k[0] == "attn_pool":
        rest = k[1:]
        base = "visual.attn_pool"
        if rest == ["query"]:
            return f"{base}.query", None
        if rest[0] in ("ln_q", "ln_k"):
            return f"{base}.{rest[0]}.{'weight' if rest[1] == 'scale' else 'bias'}", None
        if rest[0] in ("q_proj", "k_proj", "v_proj"):
            idx = {"q_proj": 0, "k_proj": 1, "v_proj": 2}[rest[0]]
            if rest[1] == "kernel":
                return f"{base}.attn.{rest[0]}_weight", "linear"
            return f"{base}.attn.in_proj_bias", ("slice", idx)
        if rest[0] == "out_proj":
            t = "linear" if rest[1] == "kernel" else None
            return f"{base}.attn.out_proj.{'weight' if t else 'bias'}", t
    raise KeyError(f"unmapped vision param: {flax_key}")


def _text_key_map(flax_key: tuple[str, ...]):
    k = list(flax_key)
    if k == ["cls_emb"]:
        return "text.cls_emb", None
    if k == ["token_embedding", "embedding"]:
        return "text.token_embedding.weight", None
    if k == ["positional_embedding"]:
        return "text.positional_embedding", None
    if k == ["text_projection"]:
        return "text.text_projection", None
    if k == ["ln_final", "scale"]:
        return "text.ln_final.weight", None
    if k == ["ln_final", "bias"]:
        return "text.ln_final.bias", None
    m = re.match(r"resblocks_(\d+)", k[0])
    if m:
        i = m.group(1)
        rest = k[1:]
        base = f"text.transformer.resblocks.{i}"
        ln = {"scale": "weight", "bias": "bias"}
        if rest[0] in ("ls_1", "ls_2"):
            return f"{base}.{rest[0]}.gamma", None
        if rest[0] in ("ln_1", "ln_2"):
            return f"{base}.{rest[0]}.{ln[rest[1]]}", None
        if rest[0] == "in_proj":
            if rest[1] == "kernel":
                return f"{base}.attn.in_proj_weight", "linear"
            return f"{base}.attn.in_proj_bias", None
        if rest[0] == "out_proj":
            t = "linear" if rest[1] == "kernel" else None
            return f"{base}.attn.out_proj.{'weight' if t else 'bias'}", t
        if rest[0] in ("c_fc", "c_proj"):
            t = "linear" if rest[1] == "kernel" else None
            return f"{base}.mlp.{rest[0]}.{'weight' if t else 'bias'}", t
    raise KeyError(f"unmapped text param: {flax_key}")


def _decoder_key_map(flax_key: tuple[str, ...]):
    """CoCa multimodal decoder (reference `MultimodalTransformer` state-dict
    layout: text_decoder.resblocks.{i} self blocks, text_decoder.cross_attn.{i}
    cross blocks with torch-packed in_proj, ln_final, text_projection)."""
    k = list(flax_key)
    ln = {"scale": "weight", "bias": "bias"}
    if k == ["text_projection"]:
        return "text_decoder.text_projection", None
    if k[0] == "ln_final":
        return f"text_decoder.ln_final.{ln[k[1]]}", None
    m = re.match(r"resblocks_(\d+)", k[0])
    if m:
        # identical sub-layout to the text tower's resblocks
        tkey, t = _text_key_map(tuple(flax_key))
        return tkey.replace("text.transformer.", "text_decoder."), t
    m = re.match(r"cross_attn_(\d+)", k[0])
    if m:
        base = f"text_decoder.cross_attn.{m.group(1)}"
        rest = k[1:]
        if rest[0] in ("ln_1", "ln_1_kv", "ln_2"):
            return f"{base}.{rest[0]}.{ln[rest[1]]}", None
        if rest[0] in ("q_proj", "k_proj", "v_proj"):
            idx = {"q_proj": 0, "k_proj": 1, "v_proj": 2}[rest[0]]
            if rest[1] == "kernel":
                return f"{base}.attn.in_proj_weight", ("linear_slice", idx)
            return f"{base}.attn.in_proj_bias", ("slice", idx)
        if rest[0] == "out_proj":
            t = "linear" if rest[1] == "kernel" else None
            return f"{base}.attn.out_proj.{'weight' if t else 'bias'}", t
        if rest[0] in ("c_fc", "c_proj"):
            t = "linear" if rest[1] == "kernel" else None
            return f"{base}.mlp.{rest[0]}.{'weight' if t else 'bias'}", t
    raise KeyError(f"unmapped decoder param: {flax_key}")


def flax_to_torch_key(flax_key: tuple[str, ...], cfg: CLIPConfig):
    if flax_key[0] == "visual":
        return _vision_key_map(tuple(flax_key[1:]), cfg)
    if flax_key[0] == "text":
        return _text_key_map(tuple(flax_key[1:]))
    if flax_key[0] == "text_decoder":
        return _decoder_key_map(tuple(flax_key[1:]))
    if flax_key == ("logit_scale",):
        return "logit_scale", None
    raise KeyError(f"unmapped param: {flax_key}")


# ---------------------------------------------------------------------------
# state-dict plumbing


def _flatten(tree: Any, prefix=()) -> dict[tuple[str, ...], Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: dict[tuple[str, ...], Any]) -> dict:
    out: dict = {}
    for path, v in flat.items():
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return out


def unwrap_state_dict(sd: dict) -> dict:
    """Probe nested containers and strip `module.` prefixes
    (reference `eva_clip/factory.py:80-106`)."""
    for key in ("state_dict", "model", "module"):
        if key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}
    # drop RoPE frequency buffers — recomputed analytically on our side
    sd = {k: v for k, v in sd.items() if "rope.freqs" not in k and ".rope." not in k}
    sd = {k: v for k, v in sd.items() if not k.endswith(("freqs_cos", "freqs_sin", "rope.flag"))}
    return sd


def resize_pos_embed_np(pe: np.ndarray, tgt_tokens: int) -> np.ndarray:
    """Bicubic-resize a [1, 1+S^2, D] pos-embed to [1, tgt_tokens, D]
    (reference `resize_evaclip_pos_embed`, `eva_clip/utils.py:78-139`)."""
    if pe.shape[1] == tgt_tokens:
        return pe
    src = int(round((pe.shape[1] - 1) ** 0.5))
    tgt = int(round((tgt_tokens - 1) ** 0.5))
    cls_pe = pe[:, :1]
    grid = pe[:, 1:].reshape(src, src, -1).astype(np.float32)
    w = resize_weight_matrix(src, tgt, "bicubic")
    grid = np.einsum("oh,hwd->owd", w, grid)
    grid = np.einsum("pw,owd->opd", w, grid)
    return np.concatenate([cls_pe, grid.reshape(1, tgt * tgt, -1)], axis=1)


def _cubic_spline_1d(x: np.ndarray, y: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """Natural cubic spline through knots (x, y[n, m]) evaluated at xq[k].

    Small dense solve — only used at checkpoint-load time.
    """
    n = len(x)
    h = np.diff(x)
    # second derivatives via the natural-spline tridiagonal system
    a = np.zeros((n, n))
    b = np.zeros((n, y.shape[1]))
    a[0, 0] = a[-1, -1] = 1.0
    for i in range(1, n - 1):
        a[i, i - 1] = h[i - 1]
        a[i, i] = 2.0 * (h[i - 1] + h[i])
        a[i, i + 1] = h[i]
        b[i] = 6.0 * ((y[i + 1] - y[i]) / h[i] - (y[i] - y[i - 1]) / h[i - 1])
    m = np.linalg.solve(a, b)  # [n, M]
    idx = np.clip(np.searchsorted(x, xq) - 1, 0, n - 2)
    x0, x1 = x[idx], x[idx + 1]
    hh = (x1 - x0)[:, None]
    t0 = (x1 - xq)[:, None]
    t1 = (xq - x0)[:, None]
    return (
        m[idx] * t0 ** 3 / (6 * hh)
        + m[idx + 1] * t1 ** 3 / (6 * hh)
        + (y[idx] / hh - m[idx] * hh / 6) * t0
        + (y[idx + 1] / hh - m[idx + 1] * hh / 6) * t1
    )


def _geometric_coords(src_size: int, dst_size: int) -> np.ndarray:
    """BEiT rel-pos resize source coordinates: the src_size//2 knots are
    geometrically spaced so they SPAN the destination half-width (dense near
    zero relative distance, stretched at the edges) — the target integer
    grid then always interpolates, never extrapolates (reference
    `resize_rel_pos_embed`, `eva_clip/utils.py:139-204` — dead code upstream:
    it calls the nonexistent `F.interpolate.interp2d`; this is a working
    re-derivation of the BEiT original)."""
    # binary-search ratio q: src_size//2 geometric terms sum to dst_size//2
    left, right = 1.01, 1.5
    while right - left > 1e-6:
        q = (left + right) / 2.0
        gp = (1.0 - q ** (src_size // 2)) / (1.0 - q)
        if gp > dst_size // 2:
            right = q
        else:
            left = q
    dis, cur = [], 1.0
    for i in range(src_size // 2):
        dis.append(cur)
        cur += q ** (i + 1)
    r_ids = [-v for v in reversed(dis)]
    return np.asarray(r_ids + [0] + dis, np.float64)


def resize_rel_pos_table_np(table: np.ndarray, dst_num_pos: int) -> np.ndarray:
    """Resize a [(2S-1)^2 + E, H] relative-position-bias table to a new
    window size ((2D-1)^2 + E rows): geometric source coordinates + separable
    natural-cubic-spline interpolation onto the integer target grid. The E
    extra rows (cls-to-token / token-to-cls / cls-to-cls) pass through."""
    src_num_pos, heads = table.shape
    if src_num_pos == dst_num_pos:
        return table

    def split(num):
        for extra in (3, 0):  # EVA uses 3 extra tokens; plain BEiT none
            size = int(round((num - extra) ** 0.5))
            if size * size == num - extra and size % 2 == 1:
                return size, extra
        raise ValueError(f"cannot infer rel-pos grid from {num} rows")

    src_size, extra = split(src_num_pos)
    dst_size, extra_d = split(dst_num_pos)
    if extra != extra_d:
        raise ValueError("rel-pos extra-token count mismatch")
    extra_rows = table[src_size * src_size:]
    core = table[: src_size * src_size].astype(np.float64).reshape(src_size, src_size, heads)

    x = _geometric_coords(src_size, dst_size)
    t = dst_size // 2.0
    dx = np.arange(-t, t + 0.1, 1.0)
    # separable: rows then columns
    core = _cubic_spline_1d(x, core.reshape(src_size, -1), dx)
    core = core.reshape(dst_size, src_size, heads).transpose(1, 0, 2)
    core = _cubic_spline_1d(x, core.reshape(src_size, -1), dx)
    core = core.reshape(dst_size, dst_size, heads).transpose(1, 0, 2)
    return np.concatenate(
        [core.reshape(dst_size * dst_size, heads), extra_rows], axis=0
    ).astype(np.float32)


def import_state_dict(sd: dict, params: Any, cfg: CLIPConfig, strict: bool = False) -> Any:
    """Fill a Flax param pytree from a (numpy-valued) torch state dict.

    Missing keys keep their initialized values when strict=False (parity with
    the reference's `strict=False` load, `eva_clip/factory.py:283-289`).
    """
    sd = unwrap_state_dict(sd)
    flat = _flatten(params)
    used = set()
    new_flat = {}
    for path, init_val in flat.items():
        try:
            tkey, transform = flax_to_torch_key(path, cfg)
        except KeyError:
            if strict:
                raise
            new_flat[path] = init_val
            continue
        if tkey not in sd and tkey.startswith("text."):
            # open_clip hub checkpoints store text-tower keys unprefixed
            # (the reference normalizes via convert_to_custom_text_state_dict,
            # `src/open_clip/model.py:394-414`)
            alt = tkey[len("text."):]
            if alt in sd:
                tkey = alt
        if tkey not in sd:
            if strict:
                raise KeyError(f"checkpoint missing {tkey}")
            new_flat[path] = init_val
            continue
        arr = np.asarray(sd[tkey], dtype=np.float32)
        used.add(tkey)
        if isinstance(transform, tuple):
            # torch-packed q/k/v rows: ("slice", i) on 1D biases,
            # ("linear_slice", i) on 2D in_proj weights (slice then transpose)
            kind, idx = transform
            third = arr.shape[0] // 3
            arr = arr[idx * third : (idx + 1) * third]
            if kind == "linear_slice":
                arr = arr.T
        elif transform == "linear":
            arr = arr.T
        elif transform == "conv":
            arr = arr.transpose(2, 3, 1, 0)
        if tkey == "visual.pos_embed":
            arr = resize_pos_embed_np(arr, init_val.shape[1])
        elif tkey == "visual.positional_embedding":
            arr = resize_pos_embed_np(arr[None], init_val.shape[0])[0]
        elif (
            "relative_position_bias_table" in tkey
            and arr.shape[0] != init_val.shape[0]
        ):
            arr = resize_rel_pos_table_np(arr, init_val.shape[0])
        if arr.shape != tuple(init_val.shape):
            raise ValueError(f"shape mismatch for {tkey}: ckpt {arr.shape} vs model {init_val.shape}")
        new_flat[path] = arr
    return _unflatten(new_flat)


def export_state_dict(params: Any, cfg: CLIPConfig) -> dict[str, np.ndarray]:
    """Flax params -> reference-layout numpy state dict (for F-ViT interop)."""
    flat = _flatten(params)
    out = {}
    parts: dict[str, dict[int, np.ndarray]] = {}
    for path, val in flat.items():
        tkey, transform = flax_to_torch_key(path, cfg)
        arr = np.asarray(val, dtype=np.float32)
        if isinstance(transform, tuple):
            # reassemble torch-packed q/k/v keys from the three slices
            kind, idx = transform
            parts.setdefault(tkey, {})[idx] = arr.T if kind == "linear_slice" else arr
            continue
        if transform == "linear":
            arr = arr.T
        elif transform == "conv":
            arr = arr.transpose(3, 2, 0, 1)
        out[tkey] = arr
    for tkey, pieces in parts.items():
        assert sorted(pieces) == [0, 1, 2], f"incomplete packed param {tkey}"
        out[tkey] = np.concatenate([pieces[0], pieces[1], pieces[2]], axis=0)
    return out


def load_pretrained(path: str, params: Any, cfg: CLIPConfig) -> Any:
    """Load a `.pt` torch checkpoint (or a `.npz` of the same key layout)."""
    if path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
        raw = unwrap_state_dict(raw)
        sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in raw.items()}
    return import_state_dict(sd, params, cfg)


def save_torch_checkpoint(path: str, params: Any, cfg: CLIPConfig, meta: dict | None = None):
    """Write a PyTorch-loadable checkpoint in the reference layout
    (consumable by the F-ViT detector stack)."""
    import torch

    sd = {k: torch.from_numpy(v.copy()) for k, v in export_state_dict(params, cfg).items()}
    payload = dict(meta or {})
    payload["state_dict"] = sd
    torch.save(payload, path)
