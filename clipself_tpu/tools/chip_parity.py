"""On-chip bf16 parity harness (run on the real TPU).

Every golden test runs our towers in f32 through the XLA fallback attention;
the SHIPPED training path runs bf16 with the Pallas flash forward and the
custom fused one-pass flash backward. This tool bounds the drift of that
real execution path against the ACTUAL reference implementation, for BOTH
shipped vision towers (EVA02-B/16 @1024 and EVA02-L/14-336 @896 — the two
configs every reference recipe trains):

  1. builds the reference torch EVA vision tower (seeded random init,
     `/root/reference/src/open_clip/eva_clip/eva_vit_model.py`) and
     computes CPU f32 golden activations for the dense-extraction protocol —
     encode_dense at the crop and student sizes, extract_roi_features and
     encode_rois_and_image at the student size (`eva_vit_model.py:588-686`)
  2. imports the state dict into our Flax tower and runs the SAME inputs
     on the TPU in bf16 with attn_impl='auto' (flash kernels engage at the
     4097-token student sequence) and, for attribution, in f32 over the XLA
     path
  3. compares flash-vs-XLA attention GRADIENTS in bf16 on chip at the
     distill shapes (the custom fused backward vs autodiff through the
     XLA fallback; per-model head counts exercise both kv-block regimes:
     b*h=24 -> 2304, b*h=32 -> 768) and runs one full bf16 distill train
     step, asserting every gradient/update is finite

Round 4 extension: the Swin-B and ConvNeXt-B timm-family towers get the
same treatment via `run_timm_model` (goldens from transformers' independent
torch SwinModel/ConvNextModel; no flash/grad section — no flash kernels run
at their shapes). Select with
PARITY_MODELS="swin_base_patch4_window7_224:224,convnext_base:224".

Writes the drift table to PARITY_CHIP.md and prints one JSON line.
Usage:  python -m clipself_tpu.tools.chip_parity   (on the TPU host)
        BENCH_CHIP_PARITY=1 python bench.py  (same, via the bench entry)
        PARITY_MODELS="EVA02-CLIP-B-16:1024" to restrict (name:student_size
        pairs, comma-separated).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

DEFAULT_MODELS = "EVA02-CLIP-B-16:1024,EVA02-CLIP-L-14-336:896"

# torch-reference constructor kwargs per shipped config
# (`/root/reference/src/open_clip/eva_clip/model_configs/*.json`; xattn runs
# the reference's plain-softmax branch — mathematically the same attention)
_REF_KW = {
    "EVA02-CLIP-B-16": dict(
        img_size=224, patch_size=16, num_classes=512, embed_dim=768,
        depth=12, num_heads=12,
    ),
    "EVA02-CLIP-L-14-336": dict(
        img_size=336, patch_size=14, num_classes=768, embed_dim=1024,
        depth=24, num_heads=16,
    ),
}


def _ref_tower(model_name: str):
    """Reference EVA vision tower, seeded random init."""
    import torch
    from functools import partial

    import test_reference_goldens as g

    g._install_stubs()
    ev = g._ref_module("ref_eva", f"{g.REF}/eva_clip", "eva_vit_model")
    torch.manual_seed(0)
    model = ev.EVAVisionTransformer(
        use_mean_pooling=False, init_values=None, patch_dropout=0.0,
        mlp_ratio=2.6667, qkv_bias=True, drop_path_rate=0.0,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6), xattn=False,
        rope=True, postnorm=False, pt_hw_seq_len=16, intp_freq=True,
        naiveswiglu=True, subln=True, **_REF_KW[model_name],
    )
    return model.eval()


def _stats(got: np.ndarray, want: np.ndarray) -> dict:
    got = np.asarray(got, np.float32).reshape(-1, want.shape[-1])
    want = np.asarray(want, np.float32).reshape(-1, want.shape[-1])
    diff = np.abs(got - want)
    num = (got * want).sum(-1)
    den = np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1) + 1e-12
    cos = num / den
    return {
        "max_abs": float(diff.max()),
        "mean_abs": float(diff.mean()),
        "min_cos": float(cos.min()),
    }


N_BOXES = 8

# full-size timm-family towers parity-checked against transformers' torch
# implementations (SwinModel / ConvNextModel — independent math, same
# weights via the timm-layout import); run with
# PARITY_MODELS="swin_base_patch4_window7_224:224,convnext_base:224"
TIMM_PARITY_MODELS = {"swin_base_patch4_window7_224", "convnext_base"}


def _cpu_roi_golden(dense_map: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """CPU f32 golden for extract_roi_features v2: L2-normalize the torch
    dense map, 1x1-align with our weight construction (itself pinned to the
    analytic torchvision oracles in tests/test_roi_align.py)."""
    import jax
    import jax.numpy as jnp

    from clipself_tpu.ops.roi_align import denormalize_boxes, roi_align_1x1

    d = dense_map / (np.linalg.norm(dense_map, axis=-1, keepdims=True) + 1e-12)
    _, gh, gw, _ = d.shape
    with jax.default_device(jax.devices("cpu")[0]):
        out = roi_align_1x1(
            jnp.asarray(d, jnp.float32),
            denormalize_boxes(jnp.asarray(boxes, jnp.float32), gh, gw),
        )
    return np.asarray(out)


def run_timm_model(model_name: str, img_size: int, on_tpu: bool) -> tuple[dict, None]:
    """Golden-vs-chip drift for the Swin / ConvNeXt timm-family towers.

    Goldens are torch CPU f32 from the INDEPENDENT transformers
    implementations (SwinModel / ConvNextModel), composed with the adapter
    head the same way the golden test suite does
    (tests/test_timm_towers.py, tests/test_reference_goldens.py). RoI
    goldens compose the torch dense map with our CPU-f32 1x1 weights (the
    weight math is separately pinned to analytic torchvision oracles)."""
    import torch

    import jax
    import jax.numpy as jnp

    from clipself_tpu.core.config import get_model_config
    from clipself_tpu.models.factory import create_model
    from clipself_tpu.models.torch_io import import_state_dict

    import test_reference_goldens as g
    import test_timm_towers as tt

    cfg = get_model_config(model_name)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, img_size, img_size, 3)).astype(np.float32)
    lo = rng.uniform(0, 0.6, size=(1, N_BOXES, 2)).astype(np.float32)
    hi = np.clip(lo + rng.uniform(0.1, 0.4, size=(1, N_BOXES, 2)), 0, 1).astype(np.float32)
    boxes = np.concatenate([lo, hi], -1).astype(np.float32)

    if model_name.startswith("swin"):
        from transformers import SwinConfig, SwinModel

        torch.manual_seed(0)
        hf = SwinModel(
            SwinConfig(
                image_size=224, patch_size=4, embed_dim=128,
                depths=[2, 2, 18, 2], num_heads=[4, 8, 16, 32], window_size=7,
                drop_path_rate=0.0, hidden_dropout_prob=0.0,
                attention_probs_dropout_prob=0.0,
            )
        ).eval()
        sd = tt._hf_swin_to_timm_keys(hf.state_dict())
        proj = (rng.normal(size=(cfg.embed_dim, 1024)) * 0.02).astype(np.float32)
        sd["visual.head.proj.weight"] = proj
        with torch.no_grad():
            lhs = hf(
                torch.from_numpy(img).permute(0, 3, 1, 2)
            ).last_hidden_state.numpy()  # [1, 49, 1024] final normed map
        want_img = lhs.mean(1) @ proj.T
        gh = gw = img_size // 32
        want_dense = (lhs @ proj.T).reshape(1, gh, gw, -1)
    else:  # convnext
        from transformers import ConvNextConfig, ConvNextModel

        depths, dims = (3, 3, 27, 3), (128, 256, 512, 1024)
        torch.manual_seed(0)
        hf = ConvNextModel(
            ConvNextConfig(
                depths=list(depths), hidden_sizes=list(dims), num_channels=3,
                layer_norm_eps=1e-6, layer_scale_init_value=0.1,
            )
        ).eval()
        with torch.no_grad():  # constant gammas would mask errors
            for name, prm in hf.named_parameters():
                if "layer_scale_parameter" in name:
                    prm.uniform_(0.05, 0.4)
        g._install_stubs()
        g._install_open_clip_abs_stub()
        stub = g._install_timm_convnext_stub(hf, dims[-1])
        tm = g._ref_module("ref_oc_parity", g.REF, "timm_model")
        torch.manual_seed(8)
        ref = tm.TimmModel(
            "convnext_base", embed_dim=cfg.embed_dim, image_size=img_size,
            pool="", proj="linear", drop=0.0, pretrained=False,
        ).eval()
        with torch.no_grad():
            stub.head.norm.weight.uniform_(0.5, 1.5)
            stub.head.norm.bias.normal_(0.0, 0.2)
        sd = g._hf_to_timm_keys(hf.state_dict())
        sd["visual.trunk.head.norm.weight"] = stub.head.norm.weight.detach().numpy()
        sd["visual.trunk.head.norm.bias"] = stub.head.norm.bias.detach().numpy()
        for k, v in ref.head.state_dict().items():
            sd[f"visual.head.{k}"] = v.detach().numpy()
        with torch.no_grad():
            t = torch.from_numpy(img).permute(0, 3, 1, 2)
            want_img = ref(t).numpy()
            want_dense = np.moveaxis(ref.encode_dense(t).numpy(), 1, -1)

    want_rois = _cpu_roi_golden(want_dense, boxes)
    results = {}

    def run_paths(dtype, tag):
        model, params = create_model(cfg, dtype=dtype)
        params = import_state_dict(sd, dict(params), cfg, strict=False)
        if dtype == jnp.bfloat16:
            params = jax.tree.map(jnp.asarray, params)
        ji, jb = jnp.asarray(img, dtype), jnp.asarray(boxes)
        pooled = jax.jit(
            lambda p, i: model.apply({"params": p}, i, method="encode_image")
        )(params, ji)
        dense = jax.jit(
            lambda p, i: model.apply(
                {"params": p}, i, False, True, method="encode_dense"
            )
        )(params, ji)
        rois = jax.jit(
            lambda p, i, b: model.apply(
                {"params": p}, i, b, False, "v2", method="encode_pseudo_boxes"
            )
        )(params, ji, jb)
        results[f"{tag}: encode_image {img_size}"] = _stats(pooled, want_img)
        results[f"{tag}: encode_dense {img_size}"] = _stats(
            np.asarray(dense).reshape(-1, want_dense.shape[-1]),
            want_dense.reshape(-1, want_dense.shape[-1]),
        )
        results[f"{tag}: extract_roi_features v2 {img_size}"] = _stats(
            np.asarray(rois).reshape(-1, want_rois.shape[-1]),
            want_rois.reshape(-1, want_rois.shape[-1]),
        )

    if on_tpu:
        run_paths(jnp.bfloat16, "chip bf16")
    run_paths(jnp.float32, f"{jax.default_backend()} f32 xla")
    return results, None


def _detector_leg(dtype_str: str) -> dict:
    """One detector leg on the CURRENT jax backend: deterministic seeded
    construction (create_model seed default + det.init PRNGKey(0)) so both
    legs build bit-identical f32 params without shipping pytrees across
    processes. Returns flat numpy arrays."""
    import jax
    import jax.numpy as jnp

    from clipself_tpu.detector.config import PRESETS
    from clipself_tpu.detector.fvit import FViTDetector, backbone_taps
    from clipself_tpu.models.factory import create_model

    cfg = PRESETS["ov_coco_vitb16"]
    img_size = cfg.image_size
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype_str]
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, img_size, img_size, 3)).astype(np.float32)
    ce = rng.normal(size=(cfg.num_classes + 1, cfg.embed_dim)).astype(np.float32)
    ce /= np.linalg.norm(ce, axis=-1, keepdims=True)
    lo = rng.uniform(0, 0.6, size=(1, 32, 2)).astype(np.float32) * img_size
    ext = rng.uniform(0.1, 0.35, size=(1, 32, 2)).astype(np.float32) * img_size
    rois = np.concatenate([lo, np.clip(lo + ext, 0, img_size)], -1).astype(np.float32)

    clip, clip_params = create_model(cfg.clip_model, dtype=dtype)
    det = FViTDetector(cfg, dtype=dtype)
    gh = img_size // cfg.patch_size
    init_taps = [
        jnp.zeros((1, gh, gh, cfg.backbone_width), dtype)
        for _ in cfg.out_indices
    ]
    det_params = jax.jit(
        lambda key: det.init(
            key, init_taps, jnp.asarray(rois[:, :1]), jnp.asarray(ce)
        )["params"]
    )(jax.random.PRNGKey(0))

    ji, jce, jrois = jnp.asarray(img), jnp.asarray(ce), jnp.asarray(rois)
    taps, dense = jax.jit(
        lambda p, i: backbone_taps(clip, p, i, cfg, True)
    )(clip_params, ji)

    def head_fn(p, taps, r, c):
        from clipself_tpu.detector.roi_head import multilevel_roi_align

        feats, smap, dmap = det.apply({"params": p}, taps, method="features")
        pooled = multilevel_roi_align(
            feats[:4], r, cfg.anchors.strides[:4], cfg.roi_feat_size,
            cfg.finest_scale,
        )
        b, n = pooled.shape[:2]
        logits, deltas, _ = det.apply(
            {"params": p},
            pooled.reshape((b * n,) + pooled.shape[2:]), c,
            method=lambda m, x, c_: m.bbox_head(x, c_),
        )
        return smap, dmap, logits, deltas

    smap, dmap, logits, deltas = jax.jit(head_fn)(det_params, taps, jrois, jce)
    bm = jnp.ones(cfg.num_classes + 1, bool)
    boxes, scores, labels = jax.jit(
        lambda p, t, d, c: det.apply(
            {"params": p}, t, d, c, bm, method="predict"
        )
    )(det_params, taps, dense, jce)
    return dict(
        taps=np.concatenate(
            [np.asarray(t, np.float32).reshape(-1, t.shape[-1]) for t in taps]
        ),
        dense=np.asarray(dense, np.float32).reshape(-1, dense.shape[-1]),
        rpn=np.concatenate(
            [np.asarray(s_, np.float32).reshape(-1, s_.shape[-1]) for s_ in smap]
        ),
        logits=np.asarray(logits, np.float32),
        deltas=np.asarray(deltas, np.float32).reshape(-1, 4),
        det_boxes=np.asarray(boxes, np.float32),
        det_scores=np.asarray(scores, np.float32),
        det_labels=np.asarray(labels),
    )


def run_detector_model(img_size: int, on_tpu: bool) -> tuple[dict, None]:
    """FViT detector `predict` drift: chip bf16 (the shipped path) vs CPU
    f32, ov_coco_vitb16 preset at its recipe resolution (VERDICT r4 weak
    #3/#2b: the detector predict path previously had no PARITY_CHIP
    evidence class — in particular the bf16 NxN RoI-align intermediate and
    the bf16 head stack).

    Both legs build bit-identical f32 params by seeded construction
    (`_detector_leg`). The f32 leg runs in a forced-CPU SUBPROCESS: the
    Pallas kernels (rope roll, NMS) gate on `jax.default_backend()`, which
    stays "tpu" for CPU-placed arrays in-process, so a same-process CPU leg
    would trace uninterpretable pallas_calls. Tensor rows compare
    deterministic intermediates (backbone taps, dense VLM map, RPN maps,
    bbox-head outputs on FIXED rois — no NMS in the comparison path); the
    end-to-end `predict` detections are matched by IoU and summarized in a
    note (NMS can reorder under drift). Select with
    PARITY_MODELS="fvit_detector_predict:640".
    """
    import subprocess
    import tempfile

    from clipself_tpu.detector.config import PRESETS

    assert PRESETS["ov_coco_vitb16"].image_size == img_size

    with tempfile.NamedTemporaryFile(suffix=".npz") as tf:
        env = dict(os.environ)
        env.update({"PARITY_DET_LEG": "f32", "PARITY_DET_OUT": tf.name})
        t0 = time.perf_counter()
        subprocess.run(
            [sys.executable, "-m", "clipself_tpu.tools.chip_parity"],
            env=env, check=True, cwd=str(REPO),
        )
        print(
            f"detector f32 CPU leg: {time.perf_counter() - t0:.0f}s",
            file=sys.stderr,
        )
        want = dict(np.load(tf.name))
    got = _detector_leg("bf16")  # current backend: the chip when on_tpu

    tag = "chip bf16" if on_tpu else "cpu bf16"

    def _chunk(x, w=1024):
        # cosine over 1024-wide chunks: the raw last dim (3 anchors) is too
        # narrow for a meaningful row cosine on near-zero random logits
        r = np.asarray(x, np.float32).reshape(-1)
        return r[: r.size // w * w].reshape(-1, w)

    results = {
        f"{tag}: backbone taps {img_size}": _stats(got["taps"], want["taps"]),
        f"{tag}: dense vlm map": _stats(got["dense"], want["dense"]),
        f"{tag}: rpn objectness maps": _stats(_chunk(got["rpn"]), _chunk(want["rpn"])),
        f"{tag}: bbox-head cls logits (32 fixed rois)": _stats(
            got["logits"], want["logits"]
        ),
        f"{tag}: bbox-head box deltas (32 fixed rois)": _stats(
            got["deltas"], want["deltas"]
        ),
    }

    # end-to-end predict: IoU-match the f32 leg's confident detections
    fb, fs, fl = want["det_boxes"], want["det_scores"], want["det_labels"]
    bb, bs, bl = got["det_boxes"], got["det_scores"], got["det_labels"]
    def match(idx):
        # one-to-one greedy matching in f32-score order: each bf16
        # detection may absorb only one f32 detection, so match counts
        # cannot be inflated by many-to-one argmax hits
        used = set()
        n_match = lab_ok = 0
        max_sd, min_iou = 0.0, 1.0
        for j in idx:
            x0 = np.maximum(fb[0, j, 0], bb[0, :, 0])
            y0 = np.maximum(fb[0, j, 1], bb[0, :, 1])
            x1 = np.minimum(fb[0, j, 2], bb[0, :, 2])
            y1 = np.minimum(fb[0, j, 3], bb[0, :, 3])
            inter = np.clip(x1 - x0, 0, None) * np.clip(y1 - y0, 0, None)
            a1 = (fb[0, j, 2] - fb[0, j, 0]) * (fb[0, j, 3] - fb[0, j, 1])
            a2 = (bb[0, :, 2] - bb[0, :, 0]) * (bb[0, :, 3] - bb[0, :, 1])
            iou = inter / np.maximum(a1 + a2 - inter, 1e-9)
            if used:
                iou[list(used)] = -1.0
            m = int(np.argmax(iou))
            if iou[m] > 0.5:
                used.add(m)
                n_match += 1
                lab_ok += int(bl[0, m] == fl[0, j])
                max_sd = max(max_sd, abs(float(bs[0, m] - fs[0, j])))
                min_iou = min(min_iou, float(iou[m]))
        return n_match, lab_ok, max_sd, min_iou

    keep = np.where(fs[0] > 0.0)[0]
    keep = keep[np.argsort(-fs[0][keep])]  # f32-score order for matching
    top = keep[:10]
    am, al, asd, aiou = match(keep)
    tm, tl, tsd, tiou = match(top)
    results["_note"] = (
        f"End-to-end `predict` (RPN proposals + NMS + VLM fusion + final "
        f"NMS), random frozen backbone + random class embeddings — the "
        f"score distribution sits at chance level (~1/66), so the "
        f"detection TAIL is threshold noise by construction. Top "
        f"{len(top)} f32 detections by score: {tm}/{len(top)} one-to-one "
        f"matched in the {tag} leg at IoU>0.5 (min matched IoU "
        f"{tiou:.4f}), {tl}/{max(tm, 1)} same label, max fused-score "
        f"drift {tsd:.4f}. All {len(keep)} above-threshold f32 "
        f"detections: {am} matched, {al}/{max(am, 1)} same label, max "
        f"drift {asd:.4f}."
    )
    return results, None


def run_model(model_name: str, img_large: int, on_tpu: bool) -> tuple[dict, dict]:
    """Golden-vs-chip drift for one tower. Returns (results, grad_stats)."""
    import torch

    import jax
    import jax.numpy as jnp

    from clipself_tpu.core.config import get_model_config
    from clipself_tpu.models.factory import create_model
    from clipself_tpu.models.torch_io import import_state_dict

    cfg = get_model_config(model_name)
    crop = cfg.vision.image_size
    patch = cfg.vision.patch_size
    n_heads = cfg.vision.width // cfg.vision.head_width
    n_tokens = (img_large // patch) ** 2 + 1

    # ---- reference goldens (torch CPU f32) -------------------------------
    rng = np.random.default_rng(0)
    img_s = rng.normal(size=(1, crop, crop, 3)).astype(np.float32)
    img_l = rng.normal(size=(1, img_large, img_large, 3)).astype(np.float32)
    lo = rng.uniform(0, 0.6, size=(1, N_BOXES, 2)).astype(np.float32)
    hi = np.clip(lo + rng.uniform(0.1, 0.4, size=(1, N_BOXES, 2)), 0, 1).astype(np.float32)
    boxes = np.concatenate([lo, hi], -1).astype(np.float32)

    # the torch goldens take ~20 min for L/14 on this host: cache them so a
    # crashed/restarted run (or a re-run after a kernel change) skips them
    cache_dir = Path(
        os.environ.get("PARITY_GOLDEN_CACHE", "/root/.cache/clipself_parity")
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    cache = cache_dir / f"{model_name}_{img_large}_seed0.npz"
    t0 = time.perf_counter()
    ref = _ref_tower(model_name)  # fast; only the 4k-token forwards are slow
    if cache.exists():
        z = np.load(cache)
        want_dense_s, want_dense_l = z["dense_s"], z["dense_l"]
        want_rois, want_ri_rois, want_ri_img = z["rois"], z["ri_rois"], z["ri_img"]
        print(f"{model_name} goldens loaded from {cache}", file=sys.stderr)
    else:
        with torch.no_grad():
            ts = torch.from_numpy(img_s).permute(0, 3, 1, 2)
            tl = torch.from_numpy(img_l).permute(0, 3, 1, 2)
            want_dense_s = ref.encode_dense(ts, keep_shape=False).numpy()
            want_dense_l = ref.encode_dense(tl, keep_shape=False).numpy()
            want_rois = ref.extract_roi_features(
                tl, [torch.from_numpy(boxes[0])]
            ).numpy()
            want_ri_rois, want_ri_img = ref.encode_rois_and_image(
                tl, [torch.from_numpy(boxes[0])]
            )
            want_ri_rois = want_ri_rois.numpy()
            want_ri_img = want_ri_img.numpy()
        np.savez(
            cache, dense_s=want_dense_s, dense_l=want_dense_l, rois=want_rois,
            ri_rois=want_ri_rois, ri_img=want_ri_img,
        )
        print(
            f"{model_name} reference CPU goldens: "
            f"{time.perf_counter() - t0:.0f}s (cached to {cache})",
            file=sys.stderr,
        )
    emb_dim = want_rois.shape[-1]

    sd = {f"visual.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}

    results = {}

    def run_paths(dtype, attn_impl, tag):
        model, params = create_model(cfg, dtype=dtype, attn_impl=attn_impl)
        params = import_state_dict(sd, dict(params), cfg, strict=False)
        if dtype == jnp.bfloat16:
            params = jax.tree.map(jnp.asarray, params)  # params stay f32

        # params as jit ARGUMENTS: closing over them embeds ~86-300M f32
        # constants and exceeds the remote-compile upload limit (HTTP 413)
        js, jl = jnp.asarray(img_s, dtype), jnp.asarray(img_l, dtype)
        jb = jnp.asarray(boxes)
        dense_fn = jax.jit(
            lambda p, i: model.apply({"params": p}, i, False, False, method="encode_dense")
        )
        dense_s = dense_fn(params, js)
        dense_l = dense_fn(params, jl)
        rois = jax.jit(
            lambda p, i, b: model.apply(
                {"params": p}, i, b, False, method="encode_pseudo_boxes"
            )
        )(params, jl, jb)
        ri_rois, ri_img = jax.jit(
            lambda p, i, b: model.apply(
                {"params": p}, i, b, method="encode_rois_and_image"
            )
        )(params, jl, jb)
        results[f"{tag}: encode_dense {crop}"] = _stats(dense_s, want_dense_s)
        results[f"{tag}: encode_dense {img_large}"] = _stats(dense_l, want_dense_l)
        results[f"{tag}: extract_roi_features {img_large}"] = _stats(
            np.asarray(rois).reshape(-1, emb_dim), want_rois
        )
        results[f"{tag}: rois_and_image rois"] = _stats(
            np.asarray(ri_rois).reshape(-1, emb_dim), want_ri_rois
        )
        results[f"{tag}: rois_and_image image"] = _stats(ri_img, want_ri_img)

    if on_tpu:
        run_paths(jnp.bfloat16, "auto", "chip bf16+flash")
    # attribution baseline: same implementation, f32 XLA path
    run_paths(jnp.float32, "xla", f"{jax.default_backend()} f32 xla")

    # ---- flash-vs-XLA bf16 gradients on chip ------------------------------
    grad_stats = None
    if on_tpu:
        from clipself_tpu.ops.attention import multi_head_attention

        b, h, d = 2, n_heads, cfg.vision.head_width
        from clipself_tpu.ops.attention import flash_pad_target

        n = flash_pad_target(n_tokens)
        seg = jnp.asarray(
            (np.arange(n) < n_tokens).astype(np.float32)[None].repeat(b, 0)
        )
        qkv = [
            jnp.asarray(rng.normal(size=(b, n, h, d)) * 0.3, jnp.bfloat16)
            for _ in range(3)
        ]
        # upstream grads are ZERO at padding rows (the trunk slices them off
        # before any loss); leaving them random would let the XLA emulation's
        # pad queries — which see real keys through the column-only bias —
        # inject spurious dk/dv the flash segment semantics rightly exclude
        do = jnp.asarray(
            rng.normal(size=(b, n, h, d)) * np.asarray(seg)[:, :, None, None],
            jnp.bfloat16,
        )

        def loss(impl):
            def f(q, k, v):
                out = multi_head_attention(
                    q, k, v, d ** -0.5, impl=impl,
                    segment_mask=seg if impl == "flash" else None,
                    mask=None if impl == "flash" else jnp.where(
                        seg[:, None, None, :] > 0, 0.0, -1e9
                    ).astype(jnp.float32),
                )
                return (out * do).sum().astype(jnp.float32)
            # same scoped-VMEM budget as the shipped train step: this IS the
            # real execution path being certified (the 1536-tile residual
            # forward + 2304-kv backward need the 32MB budget)
            from clipself_tpu.train.step import _tpu_compiler_options

            return jax.jit(
                jax.grad(f, argnums=(0, 1, 2)),
                compiler_options=_tpu_compiler_options(),
            )

        g_flash = loss("flash")(*qkv)
        g_xla = loss("xla")(*qkv)
        grad_stats = {}
        for name, gf, gx in zip("qkv", g_flash, g_xla):
            # compare on the REAL rows only (padding rows are zeroed by the
            # flash segment mask; the xla path sees them through the bias)
            gf = np.asarray(gf, np.float32)[:, :n_tokens].reshape(-1, d)
            gx = np.asarray(gx, np.float32)[:, :n_tokens].reshape(-1, d)
            grad_stats[f"d{name}"] = _stats(gf, gx)

        # full bf16 distill train step: finite grads/updates end to end
        from clipself_tpu.train.methods import clipself_loss
        from clipself_tpu.train.optim import build_optimizer, make_schedule
        from clipself_tpu.train.step import TrainState, make_train_step

        model, params = create_model(cfg, dtype=jnp.bfloat16)
        teacher = jax.tree.map(jnp.copy, params)
        tx = build_optimizer(
            params, make_schedule("cosine", 1e-5, 10, 100), wd=0.1,
            unlocked_groups=cfg.vision.layers, num_layers=cfg.vision.layers,
        )
        step = make_train_step(model, tx, clipself_loss, mesh=None)
        state = TrainState.create(params, tx)
        m = 20
        lo2 = rng.uniform(0, 0.5, size=(2, m, 2)).astype(np.float32)
        hi2 = np.clip(lo2 + rng.uniform(0.05, 0.5, size=(2, m, 2)), 0, 1)
        batch = {
            "images": jnp.asarray(
                rng.normal(size=(2, img_large, img_large, 3)), jnp.float32
            ),
            "boxes": jnp.asarray(
                np.concatenate([lo2, hi2, np.ones((2, m, 1))], -1), jnp.float32
            ),
            "crops": jnp.asarray(rng.normal(size=(2, m, crop, crop, 3)), jnp.float32),
        }
        state, metrics = step(state, teacher, batch, jax.random.PRNGKey(0))
        loss_v = float(metrics["loss"])
        finite = bool(
            np.isfinite(loss_v)
            and all(
                bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(state.params)
            )
        )
        results["train step bf16+fused-bwd"] = {
            "loss": loss_v, "all_params_finite": finite,
        }
        assert finite, "non-finite parameters after the bf16 distill step"

    return results, grad_stats


def carry_sections(report_path: Path, run_names: set) -> list:
    """Markdown lines of every existing `## <model> (student ...)` section in
    the report that this run does not regenerate (empty if none).

    Title contract (enforced by the writer below): every model section opens
    with a line matching `^## <model name> (student <N>px)` followed by a
    `_Measured <date> ...` provenance stamp, so carried sections keep their
    own measurement date instead of inheriting the fresh header's. Sections
    are split on line-anchored `^## ` only (a mid-line `## ` cannot break
    the parse), and a section without a stamp gets an explicit
    `(carried unchanged from a previous run)` annotation.
    """
    import re

    carried = []
    if report_path.exists():
        parts = re.split(r"(?m)^## ", report_path.read_text())[1:]
        for sec in parts:
            m = re.match(r"(?P<name>.+?) \(student", sec.splitlines()[0])
            sec_name = m.group("name").strip() if m else None
            if sec_name is None or sec_name not in run_names:
                lines = sec.rstrip("\n").splitlines()
                has_stamp = any(l.startswith("_Measured ") for l in lines[1:4])
                if not has_stamp:
                    lines.insert(1, "")
                    lines.insert(2, "_(carried unchanged from a previous run.)_")
                carried += ["", "## " + "\n".join(lines)]
    return carried


def main():
    import jax

    leg = os.environ.get("PARITY_DET_LEG")
    if leg:
        # detector f32 leg subprocess (run_detector_model): force the CPU
        # platform BEFORE any backend exists — env JAX_PLATFORMS is not
        # enough, the axon plugin overrides it
        jax.config.update("jax_platforms", "cpu")
        out = _detector_leg(leg)
        np.savez(os.environ["PARITY_DET_OUT"], **out)
        print(f"detector {leg} leg done on {jax.default_backend()}", file=sys.stderr)
        return

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILE_CACHE", "/root/.cache/jax_compilation"),
    )
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    models = []
    for part in os.environ.get("PARITY_MODELS", DEFAULT_MODELS).split(","):
        name, size = part.strip().rsplit(":", 1)
        models.append((name, int(size)))

    header = [
        "# PARITY_CHIP — real-execution-path drift vs the reference",
        "",
        f"Generated by `tools/chip_parity.py` on backend "
        f"`{jax.default_backend()}` ({time.strftime('%Y-%m-%d')}).",
        "",
        "Golden sources: the ACTUAL reference EVA towers "
        "(`eva_vit_model.py:588-686`) for the EVA sections, and "
        "transformers' independent torch implementations (SwinModel / "
        "ConvNextModel, timm-layout weight import) for the Swin/ConvNeXt "
        "sections — seeded random init, torch CPU f32 in both cases. "
        "`chip bf16[+flash]` is the SHIPPED path: bf16 activations (flash "
        "kernels engage on the EVA 4097-token student sequence; the timm "
        "towers run windowed/conv math). RoI goldens for the timm towers "
        "compose the torch dense map with our CPU-f32 1x1 weights "
        "(separately pinned to analytic torchvision oracles). The f32/XLA "
        "row isolates implementation drift from precision drift.",
    ]
    # a PARITY_MODELS-restricted run must not clobber other models' measured
    # sections: carry over every existing section this run doesn't regenerate
    report_path = REPO / "PARITY_CHIP.md"
    carried = carry_sections(report_path, {name for name, _ in models})

    # write the report incrementally so a crash mid-run keeps finished models
    per_model = {}
    lines = list(header)
    for name, size in models:
        if name == "fvit_detector_predict":
            per_model[name] = run_detector_model(size, on_tpu)
        elif name in TIMM_PARITY_MODELS:
            per_model[name] = run_timm_model(name, size, on_tpu)
        else:
            per_model[name] = run_model(name, size, on_tpu)
        results, grad_stats = per_model[name]
        lines += [
            "",
            f"## {name} (student {size}px)",
            "",
            f"_Measured {time.strftime('%Y-%m-%d')} on backend "
            f"`{jax.default_backend()}` by this run._",
            "",
            "| Path | max abs | mean abs | min cosine |",
            "|---|---|---|---|",
        ]
        for k, v in results.items():
            if "max_abs" in v:
                lines.append(
                    f"| {k} | {v['max_abs']:.2e} | {v['mean_abs']:.2e} | "
                    f"{v['min_cos']:.6f} |"
                )
        if "_note" in results:
            lines += ["", results["_note"]]
        if grad_stats:
            lines += [
                "",
                "Flash fused backward vs XLA-autodiff backward, bf16 on chip, "
                "distill shapes:",
                "",
                "| Grad | max abs | mean abs | min cosine |",
                "|---|---|---|---|",
            ]
            for k, v in grad_stats.items():
                lines.append(
                    f"| {k} | {v['max_abs']:.2e} | {v['mean_abs']:.2e} | "
                    f"{v['min_cos']:.6f} |"
                )
        if "train step bf16+fused-bwd" in results:
            ts = results["train step bf16+fused-bwd"]
            lines += [
                "",
                f"Full bf16 distill train step ({size}px, 20 crops, fused "
                f"flash backward): loss = {ts['loss']:.4f}, all parameters "
                f"finite after the update = {ts['all_params_finite']}.",
            ]
        report_path.write_text("\n".join(lines + carried) + "\n")
        print(f"{name} done; PARITY_CHIP.md updated", file=sys.stderr)

    all_results = {
        f"{name}: {k}": v
        for name, (results, _) in per_model.items()
        for k, v in results.items()
    }
    summary = {
        "metric": "min feature cosine, chip bf16+flash vs reference f32 goldens",
        "value": min(
            (
                v["min_cos"] for k, v in all_results.items()
                if "min_cos" in v and "chip" in k
            ),
            default=None,
        ) if on_tpu else None,
        "paths": all_results,
        "grads": {name: g for name, (_, g) in per_model.items()},
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
