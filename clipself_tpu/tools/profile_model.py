"""Model FLOP/memory profiling via XLA cost analysis.

TPU-native replacement for the reference's fvcore-based profiler
(`src/training/profile.py:18-133`): instead of symbolic module hooks, the
COMPILED executable is queried for exact FLOPs, bytes accessed, and peak
memory — numbers that reflect what actually runs after XLA fusion.

CLI:
  python -m clipself_tpu.tools.profile_model --model EVA02-CLIP-B-16 \
      --image-size 224 1024 --batch-size 1
Also exposes `jax.profiler` trace capture for timeline analysis.
"""

from __future__ import annotations

import argparse
import contextlib
import json

import numpy as np


def profile_fn(fn, *specs) -> dict:
    """Compile fn for the given ShapeDtypeStructs and report cost analysis."""
    import jax

    compiled = jax.jit(fn).lower(*specs).compile()
    cost = compiled.cost_analysis() or {}
    mem = compiled.memory_analysis()
    out = {
        "gflops": round(cost.get("flops", 0.0) / 1e9, 3),
        "bytes_accessed_gb": round(cost.get("bytes accessed", 0.0) / 1e9, 3),
    }
    if mem is not None:
        out["peak_memory_gb"] = round(
            getattr(mem, "temp_size_in_bytes", 0) / 1e9, 3
        )
        out["argument_memory_gb"] = round(
            getattr(mem, "argument_size_in_bytes", 0) / 1e9, 3
        )
    return out


def profile_model(model_name: str, image_sizes, batch_size: int = 1, train: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from clipself_tpu.core.config import get_model_config
    from clipself_tpu.models.factory import create_model

    cfg = get_model_config(model_name)
    model, params = create_model(cfg, dtype=jnp.bfloat16, init=False)
    rng = jax.random.PRNGKey(0)
    img0 = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3), jnp.bfloat16)
    txt0 = jnp.zeros((1, cfg.text.context_length), jnp.int32)
    pspec = jax.eval_shape(lambda: model.init(rng, img0, txt0)["params"])
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(pspec)
    )

    S = jax.ShapeDtypeStruct
    report = {"model": model_name, "params_m": round(n_params / 1e6, 2)}
    for size in image_sizes:
        img = S((batch_size, size, size, 3), jnp.bfloat16)

        def enc(p, x):
            return model.apply({"params": p}, x, method="encode_image")

        def dense(p, x):
            return model.apply({"params": p}, x, True, method="encode_dense")

        report[f"encode_image@{size}"] = profile_fn(enc, pspec, img)
        report[f"encode_dense@{size}"] = profile_fn(dense, pspec, img)
        if train:
            # training cost at this size: grad of a scalarized dense output
            # (teacher/loss excluded — this isolates the tower's fwd+bwd)
            def dense_bwd(p, x):
                return jax.grad(lambda q: dense(q, x)[0].sum().astype(jnp.float32))(p)

            report[f"encode_dense_fwd_bwd@{size}"] = profile_fn(dense_bwd, pspec, img)
    txt = S((batch_size, cfg.text.context_length), jnp.int32)

    def etxt(p, t):
        return model.apply({"params": p}, t, method="encode_text")

    report["encode_text"] = profile_fn(etxt, pspec, txt)
    return report


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace capture (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()



def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="EVA02-CLIP-B-16")
    p.add_argument("--image-size", type=int, nargs="+", default=[224])
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--train", action="store_true",
                   help="also profile the dense fwd+bwd (training) cost")
    args = p.parse_args()
    print(json.dumps(
        profile_model(args.model, args.image_size, args.batch_size, train=args.train),
        indent=2,
    ))


if __name__ == "__main__":
    main()
