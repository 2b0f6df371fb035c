"""Detector training driver (mmdet `F-ViT/train.py` + `dist_train.sh`
equivalent), and the jitted detection train step.

Recipe parity (`configs/ov_coco/...eva_original.py:213-224`): AdamW lr 1e-4
betas (0.9, 0.999) wd 0.1, grad clip 1.0, linear warmup 250 iters at 1e-3
ratio, 3 epochs, batch 64 global. TPU design: ONE jitted step — frozen CLIP
trunk (stop-grad) + detector heads + losses + AdamW — sharded over the
`data` mesh axis.
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from clipself_tpu.detector.classes import class_weights, coco_split, lvis_split
from clipself_tpu.detector.config import PRESETS, FViTConfig
from clipself_tpu.detector.data import DetectionDataset, SyntheticDetectionData, collate
from clipself_tpu.detector.fvit import FViTDetector, backbone_taps


class DetTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))


def det_lr_schedule(base_lr: float, warmup: int = 250, warmup_ratio: float = 1e-3):
    """mmdet 'step' policy with linear warmup; the shipped step epoch (100)
    is beyond max_epochs, so post-warmup lr is constant."""

    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        frac = jnp.clip(step / max(warmup, 1), 0.0, 1.0)
        return base_lr * (warmup_ratio + (1.0 - warmup_ratio) * frac)

    return lr


def build_det_optimizer(base_lr: float = 1e-4, wd: float = 0.1, grad_clip: float = 1.0):
    # plain AdamW on EVERY parameter (biases, norm scales, the learned
    # temperature included): the reference config has no paramwise_cfg
    # (`configs/ov_coco/...original.py`: optimizer = dict(type='AdamW',
    # weight_decay=0.1)), so a ndim>=2 decay mask would silently diverge
    # from the recipe this module claims to reproduce
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_adam(),
        optax.add_decayed_weights(wd),
        optax.scale_by_learning_rate(det_lr_schedule(base_lr)),
    )


def make_det_train_step(
    det: FViTDetector,
    clip_model,
    tx,
    cfg: FViTConfig,
    class_embed: jnp.ndarray,
    class_weight: Optional[jnp.ndarray],
    mesh=None,
):
    def step_fn(state: DetTrainState, clip_params, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(p):
            taps, _ = backbone_taps(clip_model, clip_params, batch["images"], cfg, False)
            return det.apply(
                {"params": p},
                taps,
                batch["gt_boxes"],
                batch["gt_labels"].astype(jnp.int32),
                batch["gt_valid"],
                rng,
                class_embed,
                class_weight,
                batch.get("gt_masks"),
                batch.get("valid_hw"),
                method="loss",
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return state.replace(step=state.step + 1, params=params, opt_state=opt_state), metrics

    # same scoped-VMEM budget as the distill step (train/step.py): the
    # frozen L/14 trunk's 4224x1024 rope kernel needs 17.25MB of kernel
    # stack, over the compiler's 16MB default
    from clipself_tpu.train.step import _tpu_compiler_options

    opts = _tpu_compiler_options()
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,), compiler_options=opts)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
        compiler_options=opts,
    )


def parse_args(argv=None):
    p = argparse.ArgumentParser("fvit-train")
    p.add_argument("--preset", default="ov_coco_vitb16", choices=sorted(PRESETS))
    p.add_argument("--dataset", default=None, choices=["coco", "lvis"],
                   help="class-split registry; inferred from --preset when omitted")
    p.add_argument("--ann-file", default=None)
    p.add_argument("--image-root", default=None)
    p.add_argument("--class-embed", default=None, help=".npy [K+1, D] text embeddings")
    p.add_argument("--clip-checkpoint", default=None, help="distilled CLIP .pt / orbax dir")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--wd", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ratio-range", type=float, nargs=2, default=(0.1, 2.0),
                   help="train-time random resize ratio range (mmdet Resize)")
    p.add_argument("--output", default="out_fvit")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    return p.parse_args(argv)


def main(argv=None):
    from clipself_tpu.models.factory import create_model
    from clipself_tpu.parallel.mesh import create_mesh, init_distributed, shard_batch

    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    log = logging.getLogger("fvit")
    cfg = PRESETS[args.preset]
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32

    if args.dataset is None:
        args.dataset = "lvis" if "lvis" in args.preset else "coco"
    split = coco_split() if args.dataset == "coco" else lvis_split()
    k = len(split["all"])
    if k != cfg.num_classes:
        # a mismatched registry makes the background label (num_classes) an
        # out-of-bounds gather index — JAX fills those with NaN, poisoning
        # the cls loss
        raise SystemExit(
            f"--dataset {args.dataset} has {k} classes but preset "
            f"{args.preset} expects {cfg.num_classes}"
        )
    rng = np.random.default_rng(args.seed)
    if args.class_embed:
        ce = np.load(args.class_embed).astype(np.float32)
        if ce.shape != (k + 1, cfg.embed_dim):
            raise SystemExit(
                f"--class-embed {args.class_embed} has shape {ce.shape}; "
                f"preset {args.preset} needs ({k + 1}, {cfg.embed_dim}) — "
                f"{k} classes + background (build it from the matching "
                f"OV-split classes json, e.g. mscoco_65_classes.json)"
            )
    else:
        log.warning("no --class-embed given; using random embeddings")
        ce = rng.normal(size=(k + 1, cfg.embed_dim)).astype(np.float32)
    ce = ce / np.linalg.norm(ce, axis=-1, keepdims=True)
    class_embed = jnp.asarray(ce)
    cw = jnp.asarray(class_weights(args.dataset, cfg.bg_weight))

    clip_model, clip_params = create_model(
        cfg.clip_model, dtype=dtype, pretrained=args.clip_checkpoint
    )
    det = FViTDetector(cfg, dtype=dtype)

    if args.synthetic:
        data = SyntheticDetectionData(
            k, image_size=cfg.image_size, max_gt=cfg.max_gt, with_mask=cfg.with_mask
        )
        steps = args.steps_per_epoch or 10
        batches = lambda epoch: (data.batch(args.batch_size) for _ in range(steps))
    else:
        ds = DetectionDataset(
            args.ann_file, args.image_root, split["all"],
            image_size=cfg.image_size, max_gt=cfg.max_gt, train=True,
            ratio_range=tuple(args.ratio_range),
            seed=args.seed, with_mask=cfg.with_mask,
        )
        steps = args.steps_per_epoch or (len(ds) // args.batch_size)

        def batches(epoch):
            ds.set_epoch(epoch)
            order = np.random.default_rng((args.seed, epoch)).permutation(len(ds))
            for i in range(steps):
                idx = order[i * args.batch_size : (i + 1) * args.batch_size]
                if len(idx) < args.batch_size:
                    return
                yield collate([ds[int(j)] for j in idx])

    init_distributed()
    mesh = create_mesh()
    tx = build_det_optimizer(args.lr, args.wd)
    # init on tiny shapes via eval_shape-free direct init
    init_taps = [
        jnp.zeros(
            (1, cfg.image_size // cfg.patch_size, cfg.image_size // cfg.patch_size,
             cfg.backbone_width), dtype,
        )
        for _ in cfg.out_indices
    ]
    init_rois = jnp.asarray([[[4.0, 4.0, 32.0, 32.0]]])
    det_params = jax.jit(
        lambda key: det.init(key, init_taps, init_rois, class_embed)["params"]
    )(jax.random.PRNGKey(args.seed))
    state = DetTrainState.create(det_params, tx)
    step = make_det_train_step(det, clip_model, tx, cfg, class_embed, cw, mesh=mesh)

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    seen_imgs = 0
    for epoch in range(args.epochs):
        for i, batch in enumerate(batches(epoch)):
            batch = shard_batch(mesh, {k2: jnp.asarray(v) for k2, v in batch.items() if k2 not in ("scale", "image_id")})
            state, metrics = step(state, clip_params, batch, key)
            seen_imgs += args.batch_size
            if (i + 1) % args.log_every == 0 or i == 0:
                m = {k2: round(float(v), 4) for k2, v in metrics.items()}
                ips = seen_imgs / (time.time() - t0)
                log.info(f"epoch {epoch} step {i + 1}/{steps} {m} ({ips:.1f} img/s)")
        save_detector(args.output, state.params, cfg, epoch)
    log.info("done")
    return state


def save_detector(output: str, params, cfg: FViTConfig, epoch: int):
    import os
    import pickle

    os.makedirs(output, exist_ok=True)
    flat = {"/".join(map(str, [getattr(k, 'key', k) for k in path])): np.asarray(v)
            for path, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    with open(os.path.join(output, f"detector_epoch{epoch}.pkl"), "wb") as f:
        pickle.dump({"params": flat, "preset": cfg.clip_model, "epoch": epoch}, f)


if __name__ == "__main__":
    main()
