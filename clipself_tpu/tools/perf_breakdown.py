"""Whole-step component breakdown of the distill train step (real chip).

Microbenchmarks through the tunnel are unreliable (memoized repeats, noisy
timings) — a custom in-process timing loop here measured an impossible
4 ms/step. Every number is therefore produced by the ONE timing path that
is known to be trustworthy: `bench.py`'s jitted whole-step loop, run in a
fresh subprocess per variant with one component ablated (monkeypatched to
a cheap stand-in) before the model is built. The difference to `base`
attributes step time to that component. Ablated variants are NOT
numerically meaningful — timing only.

Variants:
  base        full step (bench.py configuration, B=2, 1024px, 20 crops)
  xla_attn    force the XLA fallback instead of the Pallas flash kernels
  no_attn     multi_head_attention -> v (projections/LN kept, mixing gone)
  no_rope     RoPE rotations -> identity
  no_mlp      SwiGLU -> identity (residual stream kept)
  ln_bf16     f32 LayerNorms -> bf16
  head128     same tower with head_width=128 (6 heads) — what a d=128
              head-packing kernel could at BEST buy (timing-only probe;
              random init, different model)

Usage: python -m clipself_tpu.tools.perf_breakdown        # all variants
       python -m clipself_tpu.tools.perf_breakdown VAR    # one, in-process
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

VARIANTS = ("base", "xla_attn", "no_attn", "no_rope", "no_mlp", "ln_bf16",
            "head128")


def _apply_patch(variant: str) -> None:
    """Install the variant's ablation before bench.main() builds the model."""
    if variant == "base":
        return
    import flax.linen as nn
    import jax.numpy as jnp

    import clipself_tpu.models.eva_vit as ev

    if variant == "xla_attn":
        from clipself_tpu.models import factory

        orig = factory.create_model

        def create_xla(cfg, **kw):
            kw["attn_impl"] = "xla"
            return orig(cfg, **kw)

        # bench.main() does its from-import at call time, after this patch
        factory.create_model = create_xla
    elif variant == "no_attn":
        ev.multi_head_attention = (
            lambda q, k, v, scale, mask=None, impl="auto", segment_mask=None: v
        )
    elif variant == "no_rope":
        ev.apply_rope_padded = lambda t, *a, **k: t
        ev.apply_rope_gathered = lambda t, *a, **k: t
    elif variant == "no_mlp":
        ev.SwiGLU.__call__ = lambda self, x: x
    elif variant == "ln_bf16":
        ev._layer_norm = lambda name, eps=1e-6: nn.LayerNorm(
            epsilon=eps, dtype=jnp.bfloat16, param_dtype=jnp.float32, name=name
        )
    elif variant == "head128":
        from clipself_tpu.core import config as cfgmod

        orig_get = cfgmod.get_model_config

        def get128(name):
            import dataclasses

            c = orig_get(name)
            return dataclasses.replace(
                c, vision=dataclasses.replace(c.vision, head_width=128)
            )

        cfgmod.get_model_config = get128
    else:
        raise SystemExit(f"unknown variant {variant!r}")


def _run_one(variant: str) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    _apply_patch(variant)
    # ablation runs time ONE tower (whichever BENCH_MODEL selects)
    os.environ.setdefault("BENCH_SECOND_TOWER", "0")
    import bench

    return bench.main()


def main():
    if len(sys.argv) > 1:  # child mode: one variant, JSON on the last line
        print(json.dumps(_run_one(sys.argv[1])))
        return None

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    rows = {}
    for variant in VARIANTS:
        proc = subprocess.run(
            [sys.executable, "-m", "clipself_tpu.tools.perf_breakdown", variant],
            cwd=repo, capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not line:
            print(f"{variant}: FAILED\n{proc.stderr[-2000:]}", file=sys.stderr)
            continue
        ips = json.loads(line[-1])["value"]
        rows[variant] = {"img_s": ips, "ms_step": round(2000.0 / ips, 1)}
        print(f"{variant:>10}: {rows[variant]['ms_step']:7.1f} ms/step "
              f"({ips:6.2f} img/s)", file=sys.stderr)

    base = rows.get("base", {}).get("ms_step")
    attrib = {}
    if base:
        for k, label in (
            ("no_attn", "attention math (base - no_attn)"),
            ("xla_attn", "flash kernels save (xla_attn - base)"),
            ("no_rope", "rope (base - no_rope)"),
            ("no_mlp", "mlp SwiGLU (base - no_mlp)"),
            ("ln_bf16", "f32 LN tax (base - ln_bf16)"),
            ("head128", "head128 probe (base - head128)"),
        ):
            if k in rows:
                d = rows[k]["ms_step"] - base
                attrib[label] = round(d if k == "xla_attn" else -d, 1)
    summary = {"ms_per_step": rows, "attrib_ms": attrib}
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
