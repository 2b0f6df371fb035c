"""Per-HLO summary of a jax.profiler device trace (PERF.md's XLA-Ops table).

Parses the `*.trace.json.gz` a `--profile-dir` run writes (trainer flag, or
`jax.profiler.start_trace`/`stop_trace` around bench steps), sums the "XLA
Ops" lane durations per op group across the captured steps, and prints a
ms/step table — the reproducible source for PERF.md's per-HLO sections
(round 2's table was assembled by hand; this tool replaces that).

Groups: flash custom calls (fwd/bwd split), convolutions, convert/multiply
reduce fusions, copies/transposes, and residual generic fusions.

Usage:
  python -m clipself_tpu.tools.trace_summary /tmp/prof [--steps 5]
  (positional arg: the profile dir passed to --profile-dir; the newest
  plugins/profile/*/[host].trace.json.gz inside it is used)
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def find_trace(profile_dir: str) -> str:
    pats = sorted(
        glob.glob(os.path.join(profile_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    )
    if not pats:
        raise FileNotFoundError(f"no *.trace.json.gz under {profile_dir}")
    return pats[-1]


def classify(name: str) -> str:
    n = name.lower()
    if "flash" in n and ("dkv" in n or "dq" in n or "bwd" in n or "grad" in n):
        return "flash bwd"
    if "flash" in n or ("custom-call" in n and "mosaic" in n):
        return "flash fwd"
    if "mosaic" in n or "tpu_custom_call" in n:
        return "pallas custom call"
    if "convolution" in n:  # NOT bare "conv" — matches convert_* fusions
        return "convolution"
    if "reduce" in n:
        return "reduce fusions"
    if "copy" in n or "transpose" in n or (
        ("slice" in n or "split" in n) and "fusion" not in n
    ):
        return "copies/transposes"
    if "fusion" in n:
        return "generic fusions"
    if "dot" in n or "matmul" in n:
        return "bare dots"
    return "other"


def summarize(trace_path: str, steps: int, group: str | None = None) -> dict:
    with gzip.open(trace_path, "rt") as f:
        t = json.load(f)
    ev = t["traceEvents"]
    lanes = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lanes[(e["pid"], e["tid"])] = e["args"]["name"]
    xla_lanes = {k for k, v in lanes.items() if "XLA Ops" in v}
    if not xla_lanes:
        raise RuntimeError(
            f"no 'XLA Ops' lane in {trace_path}; lanes: {sorted(set(lanes.values()))}"
        )
    by_group = defaultdict(float)
    by_name = defaultdict(float)
    by_source = defaultdict(float)
    group_ops = defaultdict(lambda: defaultdict(float))
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in xla_lanes:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "")
        g = classify(name)
        by_group[g] += dur
        by_name[re.sub(r"\.\d+$", "", name)] += dur
        src = e.get("args", {}).get("source", "?")
        by_source[src.replace("/root/repo/", "")] += dur
        group_ops[g][name] += dur
        total += dur
    out = {
        "trace": trace_path,
        "steps": steps,
        "total_ms_per_step": round(total / steps, 1),
        "groups": {
            g: round(ms / steps, 1)
            for g, ms in sorted(by_group.items(), key=lambda kv: -kv[1])
        },
        "top_ops": {
            n: round(ms / steps, 2)
            for n, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:15]
        },
    }
    out["by_source"] = {
        s: round(ms / steps, 2)
        for s, ms in sorted(by_source.items(), key=lambda kv: -kv[1])[:20]
    }
    if group:
        out["group_detail"] = {
            n: round(ms / steps, 3)
            for n, ms in sorted(group_ops[group].items(), key=lambda kv: -kv[1])
        }
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("profile_dir")
    p.add_argument("--steps", type=int, default=5,
                   help="captured steps in the trace (trainer default: 5)")
    p.add_argument("--group", default=None,
                   help="drill down: print every op in this group with its "
                        "full (unmerged) HLO name")
    args = p.parse_args(argv)
    out = summarize(find_trace(args.profile_dir), args.steps, group=args.group)
    print(f"trace: {out['trace']}", file=sys.stderr)
    print(f"device XLA-Ops total: {out['total_ms_per_step']} ms/step", file=sys.stderr)
    for g, ms in out["groups"].items():
        print(f"  {g:>20}: {ms:8.1f} ms/step", file=sys.stderr)
    print("top ops:", file=sys.stderr)
    for n, ms in out["top_ops"].items():
        print(f"  {ms:8.2f}  {n[:90]}", file=sys.stderr)
    print("top source lines:", file=sys.stderr)
    for s, ms in out["by_source"].items():
        print(f"  {ms:8.2f}  {s[:100]}", file=sys.stderr)
    if args.group:
        print(f"group '{args.group}' detail:", file=sys.stderr)
        for n, ms in out.get("group_detail", {}).items():
            print(f"  {ms:8.3f}  {n[:110]}", file=sys.stderr)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
