"""Experiment driver CLI.

TPU-native equivalent of the reference orchestration
(`src/training/main.py:55-346`): parse flags -> mesh init -> build
student+teacher -> optimizer -> data -> eval-before-train -> epoch loop with
per-step jitted training -> ensemble-on-save -> periodic zero-shot eval.

Usage (mirrors the reference scripts):
  python -m clipself_tpu.train.main \
      --model EVA02-CLIP-B-16 --pretrained ckpt.pt \
      --dataset-type grid_distill --train-data instances_train2017.json \
      --train-image-root train2017 --val-data panoptic_val2017.json \
      --val-image-root val2017 --val-segm-root panoptic_val2017 \
      --embed-path coco_panoptic_b16.npy --batch-size 16 --epochs 6

Smoke mode: --synthetic runs the full loop on synthetic data (no files).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time
from functools import partial

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("clipself_tpu trainer")
    # model
    p.add_argument("--model", default="EVA02-CLIP-B-16")
    p.add_argument("--pretrained", default=None, help=".pt or orbax checkpoint to start from")
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--grad-checkpointing", action="store_true")
    p.add_argument("--attn-impl", default="auto", choices=["auto", "xla", "flash"])
    p.add_argument("--lock-image", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--lock-image-unlocked-groups", type=int, default=12)
    p.add_argument("--lock-image-freeze-bn-stats", action="store_true",
                   help="freeze BatchNorm running stats in unlocked image-tower "
                        "groups (reference main.py:165; here stats live in the "
                        "param tree, so 'freeze' masks them from the optimizer)")
    p.add_argument("--force-patch-dropout", type=float, default=None,
                   help="override the config's vision patch_dropout "
                        "(reference factory.py:174-176)")
    p.add_argument("--pretrained-image", action="store_true",
                   help="load pretrained weights for the image trunk; timm "
                        "towers only, as in the reference (factory.py:182-187)")
    p.add_argument("--force-quick-gelu", action="store_true",
                   help="force QuickGELU activations regardless of the model "
                        "config (reference main.py:125)")
    # method
    p.add_argument("--dataset-type", default="grid_distill",
                   choices=["grid_distill", "proposals_distill", "region_clip"])
    p.add_argument("--cosine-weight", type=float, default=1.0)
    p.add_argument("--contrast-weight", type=float, default=1.0)
    p.add_argument("--multiscale", action="store_true")
    p.add_argument("--extract-type", default="v2", choices=["v1", "v2"])
    p.add_argument("--train-embed-path", default=None, help="RegionCLIP noun embeddings .npy")
    # data
    p.add_argument("--train-data", default=None)
    p.add_argument("--train-image-root", default=None)
    p.add_argument("--val-data", default=None)
    p.add_argument("--val-image-root", default=None)
    p.add_argument("--val-segm-root", default=None)
    p.add_argument("--test-type", default="coco_panoptic",
                   choices=["coco_panoptic"],
                   help="val dataset type (reference data.py:643; "
                        "coco_panoptic is the only type any recipe uses)")
    p.add_argument("--downsample-factor", type=int, default=None,
                   help="eval dense-map downsample; default = the model's "
                        "patch size (reference params.py --downsample-factor)")
    p.add_argument("--embed-path", default=None)
    p.add_argument("--det-image-size", type=int, default=1024)
    p.add_argument("--max-boxes", type=int, default=20)
    p.add_argument("--max-split", type=int, default=16)
    p.add_argument("--crop-scale", type=float, default=1.0)
    p.add_argument("--pre-transforms", action="store_true")
    p.add_argument("--train-ratio", type=float, default=1.0)
    p.add_argument("--min-size", type=float, default=8.0)
    p.add_argument("--max-size", type=float, default=1024.0)
    p.add_argument("--batch-size", type=int, default=16, help="GLOBAL batch size")
    p.add_argument("--val-batch-size", type=int, default=1)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--native-loader", action="store_true",
                   help="use the C++ decode/resize pool for grid_distill")
    p.add_argument("--synthetic", action="store_true", help="synthetic data smoke mode")
    p.add_argument("--steps-per-epoch", type=int, default=None,
                   help="override (required for --synthetic)")
    # optim
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.999)
    p.add_argument("--eps", type=float, default=1e-8)
    p.add_argument("--wd", type=float, default=0.1)
    p.add_argument("--warmup", type=int, default=1000)
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--lr-scheduler", default="cosine",
                   choices=["cosine", "const", "const-cooldown"])
    p.add_argument("--epochs-cooldown", type=int, default=None,
                   help="const-cooldown: cooldown over the last N epochs "
                        "(reference params.py --epochs-cooldown)")
    p.add_argument("--lr-cooldown-end", type=float, default=0.0)
    p.add_argument("--lr-cooldown-power", type=float, default=1.0)
    p.add_argument("--skip-scheduler", action="store_true",
                   help="constant LR, no warmup/decay (reference train.py:84)")
    p.add_argument("--grad-clip-norm", type=float, default=None)
    p.add_argument("--accum-freq", type=int, default=1,
                   help="gradient accumulation steps (reference exposes but disables this)")
    p.add_argument("--alpha", type=float, default=0.7, help="ensemble weight on save")
    # infra
    p.add_argument("--name", default=None)
    p.add_argument("--logs", default="./logs")
    p.add_argument("--resume", default=None,
                   help="checkpoint dir, or 'auto' = latest under the run dir")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of steps 10-14 here")
    p.add_argument("--save-frequency", type=int, default=1)
    p.add_argument("--save-most-recent", action="store_true",
                   help="also keep a rolling latest checkpoint every epoch, "
                        "independent of --save-frequency (reference "
                        "main.py:323-328 epoch_latest.pt)")
    p.add_argument("--keep-checkpoints", type=int, default=None,
                   help="retain only the newest N checkpoints (reference "
                        "--delete-previous-checkpoint keeps 1)")
    p.add_argument("--zeroshot-frequency", type=int, default=1)
    p.add_argument("--image-ave-pool", action="store_true",
                   help="evaluator crop features = average-pooled dense map "
                        "instead of encode_image (reference zero_shot.py:78)")
    p.add_argument("--export-torch", action="store_true",
                   help="also export each checkpoint in the PyTorch layout")
    p.add_argument("--log-every-n-steps", type=int, default=50)
    p.add_argument("--debug", action="store_true",
                   help="DEBUG log level (reference main.py:99)")
    p.add_argument("--log-local", action="store_true",
                   help="every process writes its own out-<rank>.log instead "
                        "of the rank-0-only out.log (reference main.py:88-90)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n-devices", type=int, default=None)
    p.add_argument("--fsdp-size", type=int, default=1,
                   help="shard params/optimizer state over this many devices "
                        "(ZeRO-3 over an 'fsdp' mesh axis; 1 = pure data parallel)")
    p.add_argument("--tp-size", type=int, default=1,
                   help="Megatron tensor parallelism over a 'model' mesh axis "
                        "(head count must divide; 1 = off)")
    # performance knobs (promoted from the CLIPSELF_* env channel; see
    # core/knobs.py for the full registry incl. experiment-only toggles)
    p.add_argument("--eval-ann-bucket", type=int, default=None,
                   help="zero-shot eval ann-axis bucket width (default 25; "
                        "0 disables; see core/knobs.py)")
    p.add_argument("--pad-multiple", type=int, default=None,
                   help="flash sequence-pad granularity (default 128 -> 4224 "
                        "pad at the distill shapes; see core/knobs.py)")
    p.add_argument("--scoped-vmem-kib", type=int, default=None,
                   help="TPU scoped-VMEM budget for the train step in KiB "
                        "(default 32768; 0 = compiler default)")
    return p.parse_args(argv)


def apply_knob_flags(args) -> None:
    """Push the promoted CLI knob flags into the central registry
    (core/knobs.py). Unset flags leave the env/default resolution alone."""
    from clipself_tpu.core import knobs

    for flag, knob in (
        ("eval_ann_bucket", "eval_ann_bucket"),
        ("pad_multiple", "pad_multiple"),
        ("scoped_vmem_kib", "scoped_vmem_kib"),
    ):
        val = getattr(args, flag, None)
        if val is not None:
            knobs.set(knob, val)


def build_data(args, mesh):
    from clipself_tpu.data.datasets import (
        COCOPanopticEvalDataset,
        GridDistillDataset,
        ProposalDistillDataset,
        RegionCLIPDataset,
    )
    from clipself_tpu.data.loader import SyntheticDistillData, make_loader  # noqa: F401

    data = {}
    if args.synthetic:
        data["train"] = SyntheticDistillData(
            batch_size=args.batch_size,
            det_size=args.det_image_size,
            crop_size=args.input_size,
            max_anns=args.max_boxes,
        )
        data["train_size"] = args.batch_size * (args.steps_per_epoch or 10)
        return data

    if args.train_data:
        if args.dataset_type == "grid_distill":
            ds = GridDistillDataset(
                args.train_data, args.train_image_root,
                det_size=args.det_image_size, crop_size=args.input_size,
                max_split=args.max_split, max_anns=args.max_boxes,
                crop_scale=args.crop_scale, pre_transforms=args.pre_transforms,
                train_ratio=args.train_ratio, seed=args.seed,
            )
        elif args.dataset_type == "proposals_distill":
            ds = ProposalDistillDataset(
                args.train_data, args.train_image_root,
                det_size=args.det_image_size, crop_size=args.input_size,
                max_anns=args.max_boxes, min_size=args.min_size,
                max_size=args.max_size, seed=args.seed,
            )
        else:
            ds = RegionCLIPDataset(
                args.train_data, args.train_image_root,
                det_size=args.det_image_size, max_anns=args.max_boxes,
                train_ratio=args.train_ratio, seed=args.seed,
            )
        data["train_ds"] = ds
        if args.native_loader and args.dataset_type == "grid_distill":
            from clipself_tpu.data.loader import NativeDistillLoader

            data["train"] = NativeDistillLoader(
                ds, args.batch_size, shuffle=True, seed=args.seed,
                num_threads=args.workers,
            )
        else:
            # a FRESH loader per epoch (num_epochs=1, epoch folded into the
            # shuffle seed): set_epoch cannot reach grain worker processes
            # once they are spawned, and a continuous num_epochs=None stream
            # would let batches span data passes — per-epoch loaders keep the
            # workers' per-item rng and the shuffle order in step with the
            # trainer's epoch (the torch reference gets both from
            # DistributedSampler.set_epoch + drop_last)
            def train_factory(epoch, _ds=ds):
                return make_loader(
                    _ds, args.batch_size, shuffle=True, seed=args.seed + epoch,
                    num_epochs=1, worker_count=args.workers,
                )

            data["train"] = train_factory
        data["train_size"] = len(ds)

    if args.val_data:
        val_ds = COCOPanopticEvalDataset(
            args.val_data, args.val_image_root, args.val_segm_root,
            embed_path=args.embed_path, det_size=args.det_image_size,
            crop_size=args.input_size, downsample_factor=args.downsample_factor,
        )
        data["val_ds"] = val_ds
        data["val"] = partial(
            make_loader, val_ds, args.val_batch_size,
            shuffle=False, num_epochs=1, worker_count=args.workers,
            # never drop tail eval images — mAcc must see the full val set
            drop_remainder=False,
        )
    return data


def setup_logging(args, out_dir=None):
    """Rank-aware logging (reference main.py:85-100, logger.py).

    DEBUG level under --debug; once the run dir exists, rank 0 writes
    out.log (with --log-local, every process writes out-<rank>.log).
    """
    level = logging.DEBUG if args.debug else logging.INFO
    root = logging.getLogger()
    root.setLevel(level)
    if not root.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(asctime)s | %(message)s"))
        root.addHandler(h)
    if out_dir is not None:
        import jax

        # drop file handlers from any previous in-process run (tests call
        # main() repeatedly; stale handlers would write into deleted dirs)
        for h in [h for h in root.handlers if isinstance(h, logging.FileHandler)]:
            root.removeHandler(h)
            h.close()
        rank = jax.process_index()
        if rank == 0 or args.log_local:
            fname = f"out-{rank}.log" if args.log_local else "out.log"
            fh = logging.FileHandler(os.path.join(out_dir, fname))
            fh.setFormatter(
                logging.Formatter("%(asctime)s | %(levelname)s | %(message)s")
            )
            fh.setLevel(level)
            root.addHandler(fh)


def main(argv=None):
    args = parse_args(argv)
    apply_knob_flags(args)
    setup_logging(args)
    log = logging.getLogger("clipself_tpu")

    import jax

    # honor JAX_PLATFORMS even when a platform plugin (e.g. a tunneled TPU)
    # overrides the env var during backend discovery
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    import jax.numpy as jnp

    if args.grad_checkpointing:
        # see ops/flash_bwd.py: remat overflows scoped VMEM at kv=1536
        os.environ.setdefault("CLIPSELF_FLASH_BWD_BLOCK_K", "768")
    from clipself_tpu.core.config import get_model_config
    from clipself_tpu.models.factory import create_model
    from clipself_tpu.parallel.mesh import create_mesh, init_distributed

    # multi-host bootstrap BEFORE any mesh/device use (no-op single-process)
    init_distributed()
    from clipself_tpu.train import checkpoint as ckpt
    from clipself_tpu.train.methods import clipself_loss, regionclip_loss
    from clipself_tpu.train.optim import build_optimizer, make_schedule
    from clipself_tpu.train.step import TrainState, make_train_step

    cfg = get_model_config(args.model)
    import dataclasses

    if args.force_patch_dropout is not None:
        # override the config's patch dropout (reference factory.py:174-176)
        cfg = dataclasses.replace(
            cfg, vision=dataclasses.replace(
                cfg.vision, patch_dropout=args.force_patch_dropout
            ),
        )
    if args.pretrained_image:
        # reference factory.py:182-187: timm towers only
        assert cfg.vision.timm_model_name, (
            "pretrained image towers currently only supported for timm models"
        )
        cfg = dataclasses.replace(
            cfg, vision=dataclasses.replace(cfg.vision, timm_model_pretrained=True),
        )
    if args.force_quick_gelu:
        # reference main.py:125 -> factory quick_gelu override
        cfg = dataclasses.replace(
            cfg,
            vision=dataclasses.replace(cfg.vision, quick_gelu=True),
            text=dataclasses.replace(cfg.text, quick_gelu=True),
        )
    args.input_size = cfg.vision.image_size
    if args.downsample_factor is None:
        args.downsample_factor = cfg.vision.patch_size
    if args.fsdp_size > 1 or args.tp_size > 1:
        n_total = args.n_devices or len(jax.devices())
        shard_dev = args.fsdp_size * args.tp_size
        assert n_total % shard_dev == 0, (
            f"--fsdp-size {args.fsdp_size} x --tp-size {args.tp_size} must "
            f"divide device count {n_total}"
        )
        axes, shape = ["data"], [n_total // shard_dev]
        if args.fsdp_size > 1:
            axes.append("fsdp"); shape.append(args.fsdp_size)
        if args.tp_size > 1:
            axes.append("model"); shape.append(args.tp_size)
        mesh = create_mesh(args.n_devices, axis_names=tuple(axes), shape=tuple(shape))
    else:
        mesh = create_mesh(args.n_devices)
    n_dev = mesh.devices.size
    n_batch_shards = n_dev // max(args.tp_size, 1)  # model axis replicates the batch
    assert args.batch_size % n_batch_shards == 0, (
        f"global batch {args.batch_size} must divide over {n_batch_shards} batch shards"
    )
    log.info(f"mesh: {n_dev} devices; global batch {args.batch_size}")

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    model, params = create_model(
        cfg, dtype=dtype, attn_impl=args.attn_impl,
        remat=args.grad_checkpointing, pretrained=args.pretrained, seed=args.seed,
    )
    teacher_params = jax.tree.map(jnp.copy, params)  # must not alias donated state.params

    name = args.name or f"{args.model}-{args.dataset_type}-{time.strftime('%Y%m%d-%H%M%S')}"
    if not args.name and jax.process_count() > 1:
        # every host must agree on the run dir (reference broadcasts the
        # date string, main.py:74-76)
        from jax.experimental import multihost_utils

        name = multihost_utils.broadcast_one_to_all(
            np.frombuffer(name.ljust(96).encode(), np.uint8)
        ).tobytes().decode().strip()
    out_dir = os.path.join(args.logs, name)
    os.makedirs(out_dir, exist_ok=True)
    setup_logging(args, out_dir)
    with open(os.path.join(out_dir, "params.txt"), "w") as f:
        for k in sorted(vars(args)):
            f.write(f"{k}: {getattr(args, k)}\n")

    data = build_data(args, mesh)

    steps_per_epoch = args.steps_per_epoch or (data.get("train_size", 0) // args.batch_size)
    total_steps = steps_per_epoch * args.epochs

    if args.dataset_type == "region_clip":
        noun_emb = np.load(args.train_embed_path).astype(np.float32)
        noun_emb /= np.linalg.norm(noun_emb, axis=-1, keepdims=True) + 1e-12
        loss_fn = partial(
            regionclip_loss,
            noun_embeddings=jnp.asarray(noun_emb),
            contrast_weight=args.contrast_weight,
            extract_type=args.extract_type,
        )
    else:
        loss_fn = partial(
            clipself_loss, cosine_weight=args.cosine_weight, extract_type=args.extract_type
        )

    sched_kw = {}
    if args.lr_scheduler == "const-cooldown":
        cooldown_epochs = args.epochs_cooldown or max(args.epochs // 4, 1)
        sched_kw = dict(
            cooldown_steps=steps_per_epoch * cooldown_epochs,
            cooldown_power=args.lr_cooldown_power,
            cooldown_end_lr=args.lr_cooldown_end,
        )
    if args.skip_scheduler:
        # reference train.py:84 never steps the scheduler -> constant base LR
        schedule = args.lr
    else:
        schedule = make_schedule(
            args.lr_scheduler, args.lr, args.warmup, total_steps, **sched_kw
        )
    tx = build_optimizer(
        params, schedule, wd=args.wd, beta1=args.beta1, beta2=args.beta2,
        eps=args.eps, grad_clip_norm=args.grad_clip_norm,
        unlocked_groups=args.lock_image_unlocked_groups,
        num_layers=cfg.vision.layers, lock_image=args.lock_image,
        accum_steps=args.accum_freq,
        freeze_bn_stats=args.lock_image_freeze_bn_stats,
    )
    state = TrainState.create(params, tx)
    start_epoch = 0
    if args.resume:
        if args.resume == "auto" and not args.name:
            raise ValueError(
                "--resume auto needs --name (without it each run creates a "
                "fresh timestamped dir, so there is nothing to resume from)"
            )
        if args.resume == "auto":
            # prefer whichever of the periodic and rolling-latest dirs holds
            # the newest epoch (reference resume='latest' reads
            # epoch_latest.pt when --save-most-recent is on)
            candidates = [
                os.path.join(out_dir, "checkpoints"),
                os.path.join(out_dir, "checkpoints_latest"),
            ]
            resume_dir = max(
                (d for d in candidates if os.path.isdir(d)),
                key=lambda d: ckpt.latest_epoch(d) or -1,
                default=candidates[0],
            )
        else:
            resume_dir = args.resume
        if os.path.isdir(resume_dir):
            state, start_epoch = ckpt.restore_checkpoint(resume_dir, state)
            log.info(f"resumed from {resume_dir} at epoch {start_epoch}")
        elif args.resume != "auto":
            raise FileNotFoundError(resume_dir)
        else:
            log.info("--resume auto: no checkpoint yet, starting fresh")

    state_sh = teacher_sh = None
    if args.fsdp_size > 1 or args.tp_size > 1:
        from clipself_tpu.parallel.mesh import hybrid_shardings

        state_sh = hybrid_shardings(mesh, state)
        teacher_sh = hybrid_shardings(mesh, teacher_params)
        state = jax.tree.map(jax.device_put, state, state_sh)
        teacher_params = jax.tree.map(jax.device_put, teacher_params, teacher_sh)
        log.info(
            f"sharded state: fsdp={args.fsdp_size} tp={args.tp_size} "
            f"over mesh {dict(mesh.shape)}"
        )
    from clipself_tpu.train.optim import trainable_labels

    step_fn = make_train_step(
        model, tx, loss_fn, mesh=mesh,
        state_sharding=state_sh, teacher_sharding=teacher_sh,
        # skip the backward for frozen leaves entirely (torch requires_grad
        # parity; the labels match the optimizer's freeze mask)
        trainable=trainable_labels(
            params, unlocked_groups=args.lock_image_unlocked_groups,
            num_layers=cfg.vision.layers, lock_image=args.lock_image,
            freeze_bn_stats=args.lock_image_freeze_bn_stats,
        ),
    )
    rng = jax.random.PRNGKey(args.seed)

    # multiscale: each target size is its own compiled step (static shapes);
    # images are resized on-device (reference clipself.py:17-27 does this with
    # F.interpolate on GPU)
    if args.multiscale and args.dataset_type != "region_clip":
        from clipself_tpu.train.methods import multiscale_sizes, resize_images_for_scale

        ms_sizes = multiscale_sizes(args.det_image_size, cfg.vision.patch_size)
        ms_rng = np.random.default_rng(args.seed + 1)
        resize_fns = {
            s: jax.jit(partial(resize_images_for_scale, target_size=s)) for s in ms_sizes
        }

        def maybe_multiscale(batch):
            s = int(ms_rng.choice(ms_sizes))
            return resize_fns[s](batch)
    else:
        maybe_multiscale = lambda b: b

    def run_eval(eval_params, epoch):
        if "val" not in data or args.zeroshot_frequency == 0:
            return {}
        from clipself_tpu.eval.zero_shot import evaluate_zero_shot

        results = evaluate_zero_shot(
            model, eval_params, data["val"](), data["val_ds"].embeddings, mesh=mesh,
            image_ave_pool=args.image_ave_pool, extract_type=args.extract_type,
            progress=True,
        )
        log.info(f"eval epoch {epoch}: {json.dumps(results)}")
        with open(os.path.join(out_dir, "results.jsonl"), "a") as f:
            f.write(json.dumps({"epoch": epoch, **results}) + "\n")
        return results

    if "train" not in data:
        run_eval(state.params, start_epoch)
        return

    # eval before training (reference main.py:263-269)
    run_eval(state.params, start_epoch)

    from clipself_tpu.data.loader import device_prefetch

    # host->device transfer of batch k+1 overlaps the step on batch k
    train_factory = data["train"] if callable(data["train"]) else None
    if train_factory is None:
        train_iter = device_prefetch(iter(data["train"]), mesh, size=2)
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    for epoch in range(start_epoch, args.epochs):
        if "train_ds" in data:
            # before the factory call: grain workers pickle the dataset (and
            # its epoch) at loader construction
            data["train_ds"].set_epoch(epoch)
        if train_factory is not None:
            train_iter = device_prefetch(iter(train_factory(epoch)), mesh, size=2)
        from clipself_tpu.utils.meters import AverageMeter, ThroughputMeter

        loss_meter = AverageMeter()
        tput = ThroughputMeter(n_chips=n_dev)
        profile_start = min(10, max(steps_per_epoch - 2, 0))
        profile_stop = min(profile_start + 5, steps_per_epoch - 1)
        for i in range(steps_per_epoch):
            if args.profile_dir and epoch == start_epoch and i == profile_start:
                jax.profiler.start_trace(args.profile_dir)
            batch = maybe_multiscale(next(train_iter))
            state, metrics = step_fn(state, teacher_params, batch, rng)
            if args.profile_dir and epoch == start_epoch and i == profile_stop:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                log.info(f"profiler trace written to {args.profile_dir}")
            tput.update(args.batch_size)
            if (i + 1) % args.log_every_n_steps == 0 or i + 1 == steps_per_epoch:
                loss = float(metrics["loss"])  # device sync: only at log steps
                loss_meter.update(loss)
                ips = tput.window()  # per-interval: compile steps don't drag
                lr_now = (
                    float(schedule(int(state.step))) if callable(schedule)
                    else float(schedule)
                )
                log.info(
                    f"epoch {epoch} step {i+1}/{steps_per_epoch} "
                    f"loss {loss:.4f} lr {lr_now:.3e} | "
                    f"{ips:.1f} img/s ({ips / n_dev:.1f}/chip)"
                )
        completed = epoch + 1
        log.info(f"epoch {epoch} done | mean logged loss {loss_meter.avg:.4f}")
        if (
            args.save_frequency and completed % args.save_frequency == 0
        ) or completed == args.epochs:
            target = ckpt.save_checkpoint(
                ckpt_dir, state, teacher_params, completed, alpha=args.alpha,
                keep=args.keep_checkpoints,
            )
            if args.export_torch:
                ckpt.export_torch(
                    os.path.join(out_dir, f"epoch_{completed}.pt"),
                    jax.tree.map(np.asarray, target), cfg, epoch=completed, name=name,
                )
        else:
            from clipself_tpu.train.ensemble import student_teacher_ensemble

            target = (
                student_teacher_ensemble(state.params, teacher_params, args.alpha)
                if args.alpha < 1.0 else state.params
            )
        if args.save_most_recent:
            # rolling latest: its own manager with max_to_keep=1, written
            # every epoch regardless of --save-frequency (reference
            # main.py:323-328 writes epoch_latest.pt atomically)
            ckpt.save_checkpoint(
                os.path.join(out_dir, "checkpoints_latest"), state,
                teacher_params, completed, alpha=args.alpha, keep=1,
            )
        if args.zeroshot_frequency > 0 and completed % args.zeroshot_frequency == 0:
            run_eval(target, completed)

    log.info("done")


if __name__ == "__main__":
    main()
