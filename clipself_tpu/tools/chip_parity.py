"""On-chip bf16 parity harness (run on the real TPU).

Every golden test runs our towers in f32 through the XLA fallback attention;
the SHIPPED training path runs bf16 with the Pallas flash forward and the
custom fused one-pass flash backward. This tool bounds the drift of that
real execution path against the ACTUAL reference implementation:

  1. builds the reference torch EVA02-B/16 vision tower (seeded random
     init, `/root/reference/src/open_clip/eva_clip/eva_vit_model.py`) and
     computes CPU f32 golden activations for the dense-extraction protocol —
     encode_dense at 224^2 and 1024^2, extract_roi_features and
     encode_rois_and_image at 1024^2 (`eva_vit_model.py:588-686`)
  2. imports the state dict into our Flax tower and runs the SAME inputs
     on the TPU in bf16 with attn_impl='auto' (flash kernels engage at the
     4097-token student sequence) and, for attribution, in f32 over the XLA
     path on CPU
  3. compares flash-vs-XLA attention GRADIENTS in bf16 on chip at the
     distill shapes (the custom fused backward vs autodiff through the
     XLA fallback) and runs one full bf16 distill train step, asserting
     every gradient/update is finite

Writes the drift table to PARITY_CHIP.md and prints one JSON line.
Usage:  python -m clipself_tpu.tools.chip_parity   (on the TPU host)
        BENCH_CHIP_PARITY=1 python bench.py  (same, via the bench entry)
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

IMG_LARGE = int(os.environ.get("PARITY_IMAGE_SIZE", "1024"))
N_BOXES = 8


def _ref_b16():
    """Reference EVA02-B/16 vision tower, seeded random init."""
    import torch
    from functools import partial

    import test_reference_goldens as g

    g._install_stubs()
    ev = g._ref_module("ref_eva", f"{g.REF}/eva_clip", "eva_vit_model")
    torch.manual_seed(0)
    model = ev.EVAVisionTransformer(
        img_size=224, patch_size=16, num_classes=512, use_mean_pooling=False,
        init_values=None, patch_dropout=0.0, embed_dim=768, depth=12,
        num_heads=12, mlp_ratio=2.6667, qkv_bias=True, drop_path_rate=0.0,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6), xattn=False,
        rope=True, postnorm=False, pt_hw_seq_len=16, intp_freq=True,
        naiveswiglu=True, subln=True,
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


def main():
    import torch

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILE_CACHE", "/root/.cache/jax_compilation"),
    )
    import jax.numpy as jnp

    from clipself_tpu.core.config import get_model_config
    from clipself_tpu.models.factory import create_model
    from clipself_tpu.models.torch_io import import_state_dict

    on_tpu = jax.default_backend() == "tpu"
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    # ---- reference goldens (torch CPU f32) -------------------------------
    ref = _ref_b16()
    rng = np.random.default_rng(0)
    img_s = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
    img_l = rng.normal(size=(1, IMG_LARGE, IMG_LARGE, 3)).astype(np.float32)
    lo = rng.uniform(0, 0.6, size=(1, N_BOXES, 2)).astype(np.float32)
    hi = np.clip(lo + rng.uniform(0.1, 0.4, size=(1, N_BOXES, 2)), 0, 1).astype(np.float32)
    boxes = np.concatenate([lo, hi], -1).astype(np.float32)

    t0 = time.perf_counter()
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
    print(f"reference CPU goldens: {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    sd = {f"visual.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = get_model_config("EVA02-CLIP-B-16")

    # ---- our model on the REAL path (bf16 + flash kernels) ---------------
    results = {}

    def run_paths(dtype, attn_impl, tag):
        model, params = create_model(cfg, dtype=dtype, attn_impl=attn_impl)
        params = import_state_dict(sd, dict(params), cfg, strict=False)
        if dtype == jnp.bfloat16:
            params = jax.tree.map(jnp.asarray, params)  # params stay f32

        # params as jit ARGUMENTS: closing over them embeds ~86M f32
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
        results[f"{tag}: encode_dense 224"] = _stats(dense_s, want_dense_s)
        results[f"{tag}: encode_dense {IMG_LARGE}"] = _stats(dense_l, want_dense_l)
        results[f"{tag}: extract_roi_features {IMG_LARGE}"] = _stats(
            np.asarray(rois).reshape(-1, 512), want_rois
        )
        results[f"{tag}: rois_and_image rois"] = _stats(
            np.asarray(ri_rois).reshape(-1, 512), want_ri_rois
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

        b, h, n, d = 2, 12, 4608, 64
        seg = jnp.asarray(
            (np.arange(n) < 4097).astype(np.float32)[None].repeat(b, 0)
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
            gf = np.asarray(gf, np.float32)[:, :4097].reshape(-1, d)
            gx = np.asarray(gx, np.float32)[:, :4097].reshape(-1, d)
            grad_stats[f"d{name}"] = _stats(gf, gx)

        # full bf16 distill train step: finite grads/updates end to end
        from clipself_tpu.train.methods import clipself_loss
        from clipself_tpu.train.optim import build_optimizer, make_schedule
        from clipself_tpu.train.step import TrainState, make_train_step

        model, params = create_model(cfg, dtype=jnp.bfloat16)
        teacher = jax.tree.map(jnp.copy, params)
        tx = build_optimizer(
            params, make_schedule("cosine", 1e-5, 10, 100), wd=0.1,
            unlocked_groups=12, num_layers=12,
        )
        step = make_train_step(model, tx, clipself_loss, mesh=None)
        state = TrainState.create(params, tx)
        m = 20
        lo2 = rng.uniform(0, 0.5, size=(2, m, 2)).astype(np.float32)
        hi2 = np.clip(lo2 + rng.uniform(0.05, 0.5, size=(2, m, 2)), 0, 1)
        batch = {
            "images": jnp.asarray(
                rng.normal(size=(2, IMG_LARGE, IMG_LARGE, 3)), jnp.float32
            ),
            "boxes": jnp.asarray(
                np.concatenate([lo2, hi2, np.ones((2, m, 1))], -1), jnp.float32
            ),
            "crops": jnp.asarray(rng.normal(size=(2, m, 224, 224, 3)), jnp.float32),
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

    # ---- report -----------------------------------------------------------
    lines = [
        "# PARITY_CHIP — real-execution-path drift vs the reference",
        "",
        f"Generated by `tools/chip_parity.py` on backend "
        f"`{jax.default_backend()}` ({time.strftime('%Y-%m-%d')}).",
        "",
        "Golden source: the ACTUAL reference EVA02-B/16 "
        "(`eva_vit_model.py:588-686`), seeded random init, torch CPU f32. "
        "`chip bf16+flash` is the SHIPPED path: bf16 activations, Pallas "
        "flash forward + custom fused one-pass backward at the 4097-token "
        "student sequence. The f32/XLA row isolates implementation drift "
        "from precision drift.",
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
    if grad_stats:
        lines += [
            "",
            "Flash fused backward vs XLA-autodiff backward, bf16 on chip, "
            "distill shapes [2, 12, 4608(4097 real), 64]:",
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
            f"Full bf16 distill train step ({IMG_LARGE}px, 20 crops, fused "
            f"flash backward): loss = {ts['loss']:.4f}, all parameters "
            f"finite after the update = {ts['all_params_finite']}.",
        ]
    (REPO / "PARITY_CHIP.md").write_text("\n".join(lines) + "\n")
    summary = {
        "metric": "min feature cosine, chip bf16+flash vs reference f32 goldens",
        "value": min(
            v["min_cos"] for k, v in results.items()
            if "min_cos" in v and k.startswith("chip")
        ) if on_tpu else None,
        "paths": results,
        "grads": grad_stats,
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
