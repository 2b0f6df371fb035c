"""Central registry for every runtime performance/behavior knob.

The reference hides runtime behavior behind scattered env vars (`RoPE`,
`ENV_TYPE` — SURVEY §5 flags this as a quirk to fix); this module is the
rebuild's single channel instead. Every knob is declared here with its
default, its documented meaning, and whether it is USER-facing (promoted to
a CLI flag on the trainers/evaluators) or EXPERIMENT-only (an A/B toggle
whose measured default you should not normally change — see PERF.md for the
measurements behind each default).

Resolution order per knob: programmatic override (`set(...)`, what the CLI
flags call) > environment variable (`CLIPSELF_<NAME>`, kept for experiment
scripts and tests) > declared default.

Launcher-level env vars intentionally NOT here (they must act before any
import / in the driver, not per-run): `CLIPSELF_DISTRIBUTED` (opt into
jax.distributed.initialize, parallel/mesh.py), `CLIPSELF_CACHE` (pretrained
weight cache dir, models/pretrained.py), `CLIPSELF_DRYRUN_FULL` (driver
dryrun shape selector, __graft_entry__.py), `PARITY_MODELS` /
`PARITY_GOLDEN_CACHE` (tools/chip_parity.py), `BENCH_*` (bench.py modes).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Optional


@dataclass(frozen=True)
class Knob:
    name: str  # also the env var suffix: CLIPSELF_<NAME upper>
    default: Any
    kind: type  # int or bool
    user_facing: bool  # promoted to a CLI flag
    doc: str


_KNOBS: Dict[str, Knob] = {
    k.name: k
    for k in [
        Knob(
            "eval_ann_bucket", 25, int, True,
            "Zero-shot eval ann-axis bucket width: each batch's padded ann "
            "axis is sliced to the smallest multiple covering its last valid "
            "row (1.68x at real COCO ann counts, PERF.md). 0 disables "
            "(forced off in multi-process runs). CLI: --eval-ann-bucket.",
        ),
        Knob(
            "pad_multiple", 128, int, True,
            "Sequence-pad granularity for the pad-once flash trunk path. 128 "
            "pads 4097->4224 (384/1408 blocks, the measured best); 512 "
            "restores the conservative 4608 pad with the largest block menu. "
            "CLI: --pad-multiple.",
        ),
        Knob(
            "scoped_vmem_kib", 32768, int, True,
            "TPU scoped-VMEM budget for the train step (KiB). The compiler "
            "default 16MB is too small for the fused flash kernels at 1536 "
            "tiles; 0 keeps the compiler default. CLI: --scoped-vmem-kib.",
        ),
        Knob(
            "flash_min_seq", 0, int, False,
            "Minimum self-attention sequence length routed to the Pallas "
            "flash kernel under impl='auto' (0 = built-in default 1024). "
            "The L/14 teacher's 577-token crops are the measured crossover "
            "case (PERF.md).",
        ),
        Knob(
            "xla_lane_pad", 0, int, False,
            "Pad short XLA-path token sequences (e.g. the 197-token teacher "
            "crops) to this multiple for lane alignment; 0 = off (default; "
            "A/B'd in PERF.md).",
        ),
        Knob(
            "flash_min_block", 384, int, False,
            "Smallest acceptable flash block width when choosing the pad "
            "target (flash_pad_target); raise to re-run the 4480/4608 A/Bs.",
        ),
        Knob(
            "flash_fwd_train_block", 1536, int, False,
            "Block cap for the residual-saving flash forward inside the "
            "train step (fits the 32MB scoped budget; PERF.md +2.6%).",
        ),
        Knob(
            "fused_flash_bwd", True, bool, False,
            "Use the custom one-pass fused flash backward (default on, "
            "PERF.md); 0 falls back to autodiff through the bundled kernel.",
        ),
        Knob(
            "pallas_rope", True, bool, False,
            "Fuse the rolled-table RoPE's two jnp.roll materializations "
            "into one Pallas VMEM pass (ops/rope_roll.py, TPU only; "
            "bit-identical). 0 restores the XLA composition.",
        ),
        Knob(
            "pallas_ln", False, bool, False,
            "Fuse LayerNorm's stat+normalize passes (and its backward's "
            "re-reads) into one Pallas VMEM pass per tile in the EVA towers "
            "(ops/layer_norm.py, TPU only; ~1 ULP FMA drift). Measured "
            "NEGATIVE at the B/16 recipe: device-neutral (the reduce-fusion "
            "group collapses 14.7 -> 0.2 ms/step but reappears as generic-"
            "fusion and kernel time) while ~100 extra custom-call dispatches "
            "cost ~2.5 ms/step of host gap — but POSITIVE at the 24-layer "
            "L/14 recipe (+1.4%, interleaved pair, PERF.md round 4), whose "
            "fusion-granularity overhead is 2.5-3.1x floor. Default stays "
            "off; the shipped L/14 train scripts export it on.",
        ),
        Knob(
            "flash_cls_split", False, bool, False,
            "Exact [CLS; patches] split flash path — measured NEGATIVE on "
            "v5e (PERF.md), kept as an experiment flag.",
        ),
        Knob(
            "flash_bwd_block_q", 0, int, False,
            "Override the fused-backward q block (0 = built-in default).",
        ),
        Knob(
            "flash_bwd_block_k", 0, int, False,
            "Override the fused-backward kv block (0 = built-in default; "
            "trainers set 768 under remat).",
        ),
        Knob(
            "xla_attn_half_logits", False, bool, False,
            "Store XLA-path attention logits/probs in the input half dtype "
            "instead of f32 (softmax math stays f32-stable in-register). "
            "Halves the dominant HBM traffic of the L/14 teacher's 577-token "
            "crops ([40,16,577,577] per layer, +6% recipe throughput); "
            "matches the reference teacher's fp16-autocast numerics class "
            "(bf16's 8-bit mantissa is coarser than fp16's 10). Only engages "
            "for half-precision inputs with no additive mask. Default OFF so "
            "short-sequence student/eval paths keep f32 logits; the L/14 "
            "recipe scripts export it on, where it was measured (advisor "
            "round-4 finding).",
        ),
        Knob(
            "xla_attn_chunk_q", 0, int, False,
            "Query-chunked XLA attention: scan over query blocks of this "
            "size so each [B, H, chunk, N] logit panel is softmaxed and "
            "contracted before the next exists — the standard middle option "
            "between materializing [B, H, N, N] and Pallas flash, aimed at "
            "the L/14 teacher's 577-token crops (VERDICT r4 #3). 0 = off "
            "(default); only engages for mask-free calls with N > chunk. "
            "Measured +2% at 128 on the L/14 distill recipe (PERF.md round "
            "5) — exported by the train_clipself_*_eva_vitl14.sh scripts "
            "and the bench L/14 leg; NOT a global default (the B/16 "
            "teacher's 197-token maps are too small to matter).",
        ),
        Knob(
            "det_roi_concat_levels", True, bool, False,
            "Detector multi-level RoI-align over a row-concatenated pyramid "
            "(ops/roi_align.py::roi_align_nxn_levels): per-level axis "
            "weights scattered at static row offsets, one separable "
            "contraction, no 4-output one-hot blend — vs pooling every roi "
            "on every level. Same semantics up to f32 accumulation order "
            "(equivalence-tested); measured A/B in PERF.md. 0 restores the "
            "pool-all-levels blend path.",
        ),
        Knob(
            "fused_proj", False, bool, False,
            "Run the subln q/k/v projections (and SwiGLU's gate+up pair) "
            "as one concatenated matmul per site instead of 3/2 separate "
            "ones — same values (bias added post-split exactly as nn.Dense "
            "does), one read of the activation instead of three in "
            "fwd/dgrad/wgrad. A/B in PERF.md.",
        ),
        Knob(
            "log_grad_norm", False, bool, False,
            "Emit a per-step grad_norm metric (costs real step time; the "
            "reference only computes it under --grad-clip-norm).",
        ),
    ]
}

_overrides: Dict[str, Any] = {}


def _parse(knob: Knob, raw: str) -> Any:
    if knob.kind is bool:
        return raw == "1"
    return int(raw)


def get(name: str) -> Any:
    """Resolve a knob: programmatic override > CLIPSELF_* env > default."""
    knob = _KNOBS[name]
    if name in _overrides:
        return _overrides[name]
    raw = os.environ.get(f"CLIPSELF_{name.upper()}")
    if raw is not None and raw != "":
        return _parse(knob, raw)
    return knob.default


def set(name: str, value: Optional[Any]) -> None:  # noqa: A001 - deliberate
    """Programmatic override (what the CLI flags call). None clears it."""
    knob = _KNOBS[name]  # KeyError on unknown knobs, on purpose
    if value is None:
        _overrides.pop(name, None)
    else:
        _overrides[name] = knob.kind(value)


def describe() -> str:
    """One-table summary of every knob (docs / --help epilog)."""
    rows = []
    for k in _KNOBS.values():
        scope = "user (CLI)" if k.user_facing else "experiment"
        rows.append(
            f"  {k.name:<22} env CLIPSELF_{k.name.upper():<22} "
            f"default {k.default!s:<6} [{scope}]"
        )
    return "\n".join(rows)
