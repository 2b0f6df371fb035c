"""Analytic bytes-moved roofline for the distill step's non-flash groups.

VERDICT r2 #9: the per-HLO profile attributes a large share of step time to
non-flash fusions; PERF.md claimed they sit at their HBM floor without the
arithmetic. This tool IS the arithmetic: a transparent byte model of every
elementwise/reduce tensor the step moves, per fusion group, so measured
group times (from a `--profile-dir` trace) can be compared against
bytes / HBM bandwidth.

Model (deliberately simple, stated assumptions):
  - every elementwise fusion reads each operand once and writes its output
    once at the stated dtype (bf16 activations, f32 LN stats/loss);
  - XLA fuses LN scale/shift and gelu/SwiGLU gating into ONE fusion per
    site (reads counted once per distinct tensor, not per op);
  - backward elementwise traffic = 2x forward for the trainable trunk
    (activations re-read + cotangents written), 0x for the frozen teacher;
  - matmul/flash/conv bytes are EXCLUDED — this models the "generic
    fusions" + "convert/multiply_reduce" lanes only.

Usage: python -m clipself_tpu.tools.roofline [--model EVA02-CLIP-B-16]
           [--image-size 1024] [--crop-size 224] [--batch 2] [--crops 20]
Prints a per-site table and the group totals with the implied time at the
chip's HBM bandwidth (v5e: 819 GB/s).
"""

from __future__ import annotations

import argparse
import json


HBM_GBPS = 819.0  # v5e


def build_model(model_name: str, image_size: int, crop_size: int,
                batch: int, crops: int) -> dict:
    from clipself_tpu.core.config import get_model_config
    from clipself_tpu.ops.attention import flash_pad_target

    cfg = get_model_config(model_name)
    v = cfg.vision
    width, layers = v.width, v.layers
    hidden = int(width * v.mlp_ratio + 0.5)
    if v.naiveswiglu:
        # SwiGLU: w1/w2 project to hidden each, w3 back down
        hidden = int(width * v.mlp_ratio + 0.5)

    def tokens(img):
        return (img // v.patch_size) ** 2 + 1

    n_student = flash_pad_target(tokens(image_size))
    n_teacher = tokens(crop_size)

    bf16, f32 = 2, 4
    sites = []  # (name, group, bytes, where)

    def site(name, group, nbytes, where):
        sites.append((name, group, float(nbytes), where))

    def stream(tag, n_tok, bsz, bwd_mult):
        """Per-layer elementwise/reduce traffic for one transformer stream.
        bwd_mult: 1 = forward only (frozen teacher), 3 = fwd + 2x bwd."""
        act = bsz * n_tok * width * bf16          # one residual-stream tensor
        hid = bsz * n_tok * hidden * bf16         # one MLP hidden tensor
        qk = bsz * n_tok * width * bf16           # q or k (flat rope layout)
        for _ in range(layers):
            # pre-attn LN: read x, write normed x; f32 stats are ~N*8 bytes
            site(f"{tag} ln1", "reduce", (2 * act + bsz * n_tok * 2 * f32) * bwd_mult, tag)
            # RoPE on q and k: read + write each
            site(f"{tag} rope", "generic", (4 * qk) * bwd_mult, tag)
            # attn residual add: read x, read attn_out, write
            site(f"{tag} resid1", "generic", (3 * act) * bwd_mult, tag)
            # pre-mlp LN (subln models also have ffn_ln; fold as 1.5x)
            ln_sites = 2.5 if cfg.vision.subln else 2.0
            site(f"{tag} ln2(+ffn)", "reduce",
                 (ln_sites * act + bsz * n_tok * 2 * f32) * bwd_mult, tag)
            # SwiGLU gate: read w1x, w3x, write gated (epilogue-fused w/ matmul
            # in the best case; counted as one fusion)
            site(f"{tag} swiglu", "generic", (3 * hid) * bwd_mult, tag)
            # mlp residual add
            site(f"{tag} resid2", "generic", (3 * act) * bwd_mult, tag)

    # student: trainable trunk, fwd + bwd
    stream("student", n_student, batch, 3)
    # teacher: frozen, forward only, crops*batch sequences
    stream("teacher", n_teacher, batch * crops, 1)

    # loss-side reduces: RoI features vs teacher embeds, cosine loss,
    # logit products — all [B*M, embed] scale, negligible but counted
    emb = cfg.embed_dim
    site("loss cosine+norms", "reduce", 6 * batch * crops * emb * f32, "loss")
    # optimizer: AdamW over the trainable trunk reads p/m/v/grad and writes
    # p/m/v, all f32 -> 7 tensors per parameter. Trainable params ~= the
    # student trunk: qkv+proj (4 w^2) + SwiGLU mlp (3 w*h) per layer.
    p_layer = 4 * width * width + 3 * width * hidden
    n_params = layers * p_layer + (v.patch_size ** 2 * 3 + n_student) * width
    site("adamw update", "optimizer", 7 * n_params * f32, "opt")
    # grads also exist once in bf16 between backward and update
    site("grad materialize", "optimizer", 2 * n_params * bf16, "opt")

    return {
        "cfg": cfg,
        "sites": sites,
        "n_student": n_student,
        "n_teacher": n_teacher,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="EVA02-CLIP-B-16")
    p.add_argument("--image-size", type=int, default=1024)
    p.add_argument("--crop-size", type=int, default=224)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--crops", type=int, default=20)
    args = p.parse_args(argv)

    m = build_model(args.model, args.image_size, args.crop_size,
                    args.batch, args.crops)
    groups = {}
    for name, group, nbytes, _ in m["sites"]:
        groups.setdefault(group, 0.0)
        groups[group] += nbytes

    print(f"model {args.model}  student seq {m['n_student']}  "
          f"teacher seq {m['n_teacher']}  b={args.batch} crops={args.crops}")
    total = 0.0
    out = {}
    for g, b in sorted(groups.items()):
        ms = b / (HBM_GBPS * 1e9) * 1e3
        total += b
        out[g] = {"gbytes": round(b / 1e9, 2), "hbm_floor_ms": round(ms, 1)}
        print(f"  {g:>8}: {b / 1e9:6.2f} GB/step  -> {ms:5.1f} ms at "
              f"{HBM_GBPS:.0f} GB/s")
    ms = total / (HBM_GBPS * 1e9) * 1e3
    print(f"  {'total':>8}: {total / 1e9:6.2f} GB/step  -> {ms:5.1f} ms")
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
