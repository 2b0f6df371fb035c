"""Distillation throughput benchmark on the real chip.

Default mode measures the full jitted CLIPSelf train step — frozen
EVA02-B/16 teacher encoding 20 crops/image @224 + trainable student dense
encode @1024 (4097 tokens) + RoI-align + cosine loss + AdamW — reports
images/sec/chip for it AND the L/14-336 recipe, and appends a `recipes`
dict with one number per non-default recipe (multiscale / region_clip /
remat / eval / detector; BENCH_RECIPES=0 skips).

Other modes (one env var each): BENCH_LOADER (native C++ input pipeline,
host only), BENCH_EVAL (zero-shot panoptic evaluator), BENCH_DETECTOR
(F-ViT ov_coco at recipe shapes: train + predict), BENCH_E2E (sustained
loader -> prefetch -> step loop), BENCH_CHIP_PARITY (drift report).

Baseline anchor: the driver target of 2,000 images/sec on a v5e-8 slice
(BASELINE.md), i.e. 250 images/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_PER_CHIP = 250.0  # 2000 img/s on v5e-8 (BASELINE.md)


def bench_loader():
    """BENCH_LOADER=1: native C++ input-pipeline throughput, no TPU involved.

    Writes N 1024x768-ish JPEGs once, then measures the full host-side
    distill item transform (decode + antialiased det resize/pad to 1024^2 +
    20 crop resizes to 224^2 + normalize) through the thread pool.
    The requirement for the distill step to stay compute-bound on a v5e-8
    host is ~8 x 15.3 ≈ 123 img/s (PERF.md)."""
    import tempfile

    from PIL import Image

    from clipself_tpu.data.native_loader import NativePool, available

    assert available(), "native loader failed to build"
    n_images = int(os.environ.get("BENCH_LOADER_IMAGES", "256"))
    threads = int(os.environ.get("BENCH_LOADER_THREADS", str(os.cpu_count() or 8)))
    det, crop, m = 1024, 224, 20
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i in range(min(n_images, 32)):  # 32 distinct files, cycled
            arr = rng.integers(0, 255, size=(768, 1024, 3), dtype=np.uint8)
            p = os.path.join(d, f"{i}.jpg")
            Image.fromarray(arr).save(p, quality=90)
            paths.append(p)
        mean = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
        boxes = np.stack([
            rng.uniform(0, 400, size=m).astype(np.float32),
            rng.uniform(0, 300, size=m).astype(np.float32),
            rng.uniform(500, 1000, size=m).astype(np.float32),
            rng.uniform(400, 760, size=m).astype(np.float32),
        ], axis=1)
        det_bufs = [np.zeros((det, det, 3), np.float32) for _ in range(n_images)]
        crop_bufs = [np.zeros((m, crop, crop, 3), np.float32) for _ in range(n_images)]

        pool = NativePool(threads)
        # warmup one round
        pool.submit_distill_item(paths[0], det_bufs[0], crop_bufs[0], boxes, mean, std)
        assert pool.wait() == 0

        t0 = time.perf_counter()
        for i in range(n_images):
            pool.submit_distill_item(
                paths[i % len(paths)], det_bufs[i], crop_bufs[i], boxes, mean, std
            )
        errs = pool.wait()
        dt = time.perf_counter() - t0
        pool.close()
        assert errs == 0, f"{errs} decode errors"
        assert det_bufs[-1].any() and crop_bufs[-1].any()

    ips = n_images / dt
    result = {
        "metric": f"images/sec/host, native loader distill transform "
                  f"(decode+{det}px det+{m}x{crop}px crops, {threads} threads)",
        "value": round(ips, 2),
        "unit": "images/sec/host",
        "vs_baseline": round(ips / 110.0, 4),  # 110 img/s/host requirement
    }
    print(json.dumps(result))
    return result


def bench_detector():
    """BENCH_DETECTOR=1: F-ViT detector at RECIPE shapes on chip.

    Reference recipe (`F-ViT/configs/ov_coco/..._original.py:195-226`):
    640x640 inputs, 65-class OV-COCO vocabulary, global batch 64 over 8
    devices -> per-chip batch 8, frozen EVA02-B/16 backbone, AdamW. This mode
    builds the shipped `ov_coco_vitb16` preset, runs N jitted train steps and
    a jitted predict (inference) pass on synthetic fixed-shape batches, and
    reports img/s/chip for both. BENCH_PROFILE_DIR captures a device trace of
    the timed train loop (summarize with tools.trace_summary)."""
    import jax

    cache_dir = os.environ.get("JAX_COMPILE_CACHE", "/root/.cache/jax_compilation")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from clipself_tpu.detector.classes import base_novel_mask, class_weights, coco_split, lvis_split
    from clipself_tpu.detector.config import PRESETS
    from clipself_tpu.detector.data import SyntheticDetectionData
    from clipself_tpu.detector.evaluate import make_predict_fn
    from clipself_tpu.detector.fvit import FViTDetector
    from clipself_tpu.detector.train import (
        DetTrainState,
        build_det_optimizer,
        make_det_train_step,
    )
    from clipself_tpu.models.factory import create_model

    preset = os.environ.get("BENCH_DET_PRESET", "ov_coco_vitb16")
    cfg = PRESETS[preset]
    b = int(os.environ.get("BENCH_DET_BATCH", "8"))  # reference bs 8x8
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    dataset = "lvis" if "lvis" in preset else "coco"
    split = coco_split() if dataset == "coco" else lvis_split()
    k = cfg.num_classes
    assert len(split["all"]) == k

    clip_model, clip_params = create_model(cfg.clip_model, dtype=jnp.bfloat16)
    det = FViTDetector(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ce = rng.normal(size=(k + 1, cfg.embed_dim)).astype(np.float32)
    ce /= np.linalg.norm(ce, axis=-1, keepdims=True)
    class_embed = jnp.asarray(ce)
    cw = jnp.asarray(class_weights(dataset, cfg.bg_weight))

    gh = cfg.image_size // cfg.patch_size
    init_taps = [jnp.zeros((1, gh, gh, cfg.backbone_width), jnp.bfloat16)
                 for _ in cfg.out_indices]
    init_rois = jnp.asarray([[[4.0, 4.0, 32.0, 32.0]]])
    det_params = jax.jit(
        lambda key: det.init(key, init_taps, init_rois, class_embed)["params"]
    )(jax.random.PRNGKey(0))
    tx = build_det_optimizer()
    state = DetTrainState.create(det_params, tx)
    step = make_det_train_step(det, clip_model, tx, cfg, class_embed, cw, mesh=None)

    data = SyntheticDetectionData(
        k, image_size=cfg.image_size, max_gt=cfg.max_gt, with_mask=cfg.with_mask
    )
    # pre-staged distinct batches (tunnel memoization + transfer-path guard,
    # same rationale as the distill bench)
    batches = [
        {k2: jax.device_put(jnp.asarray(v)) for k2, v in data.batch(b).items()
         if k2 not in ("scale", "image_id")}
        for _ in range(4)
    ]
    key = jax.random.PRNGKey(0)
    state, metrics = step(state, clip_params, batches[0], key)  # warmup/compile
    print("warmup det loss:", float(metrics["loss"]), file=sys.stderr)
    state, metrics = step(state, clip_params, batches[1], key)
    jax.block_until_ready(metrics["loss"])

    prof_dir = os.environ.get("BENCH_PROFILE_DIR")
    if prof_dir:
        jax.profiler.start_trace(prof_dir)
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, clip_params, batches[i % len(batches)], key)
    final_loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    if prof_dir:
        jax.profiler.stop_trace()
        print(f"trace written to {prof_dir}", file=sys.stderr)
    assert np.isfinite(final_loss), f"non-finite det loss {final_loss}"
    train_ips = b * steps / dt

    # inference path: jitted predict (frozen trunk + dense VLM map + heads +
    # NMS + score fusion)
    bm = jnp.asarray(base_novel_mask(split=split))
    predict = make_predict_fn(det, clip_model, cfg, class_embed, bm)
    vhw = jnp.asarray(
        np.full((b, 2), float(cfg.image_size), np.float32)
    )
    out = predict(state.params, clip_params, batches[0]["images"], vhw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(steps):
        out = predict(state.params, clip_params, batches[i % len(batches)]["images"], vhw)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    pred_ips = b * steps / dt

    result = {
        "metric": (
            f"images/sec/chip, F-ViT {preset} train step "
            f"({cfg.image_size}px, {k} classes, batch {b}, frozen {cfg.clip_model})"
        ),
        "value": round(train_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(train_ips / BASELINE_PER_CHIP, 4),
        "predict_img_s": round(pred_ips, 2),
    }
    print(json.dumps(result))
    return result


def bench_e2e():
    """BENCH_E2E=1: whole-loop sustained throughput — native C++ loader
    (synthetic JPEG corpus) -> double-buffered batches -> device prefetch ->
    jitted distill step. One number for the sustained img/s plus the two
    component rates, so the host/device crossover is explicit (on this 1-vCPU
    dev box the loop is host-bound by construction; a v5e-8 host has >100
    cores — see PERF.md 'Native input pipeline')."""
    import json as _json
    import tempfile

    import jax
    import jax.numpy as jnp
    from PIL import Image

    cache_dir = os.environ.get("JAX_COMPILE_CACHE", "/root/.cache/jax_compilation")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from clipself_tpu.core.config import get_model_config
    from clipself_tpu.data.datasets import GridDistillDataset
    from clipself_tpu.data.loader import NativeDistillLoader, device_prefetch
    from clipself_tpu.models.factory import create_model
    from clipself_tpu.train.methods import clipself_loss
    from clipself_tpu.train.optim import build_optimizer, make_schedule, trainable_labels
    from clipself_tpu.train.step import TrainState, make_train_step

    b = int(os.environ.get("BENCH_BATCH", "2"))
    det, crop = 1024, 224
    n_imgs = int(os.environ.get("BENCH_E2E_IMAGES", "48"))
    n_batches = int(os.environ.get("BENCH_E2E_BATCHES", "16"))
    threads = int(os.environ.get("BENCH_LOADER_THREADS", str(os.cpu_count() or 8)))
    model_name = os.environ.get("BENCH_MODEL", "EVA02-CLIP-B-16")

    with tempfile.TemporaryDirectory() as d:
        # synthetic COCO-style corpus: JPEG sources + instances list
        rng = np.random.default_rng(0)
        images = []
        for i in range(n_imgs):
            arr = rng.integers(0, 255, size=(768, 1024, 3), dtype=np.uint8)
            name = f"{i}.jpg"
            Image.fromarray(arr).save(os.path.join(d, name), quality=90)
            images.append({"id": i, "file_name": name, "width": 1024, "height": 768})
        ann = {"images": images, "annotations": [], "categories": []}
        ann_path = os.path.join(d, "instances.json")
        with open(ann_path, "w") as f:
            _json.dump(ann, f)

        ds = GridDistillDataset(ann_path, d, det_size=det, crop_size=crop, max_anns=20)
        loader = NativeDistillLoader(ds, b, shuffle=True, num_threads=threads)

        cfg = get_model_config(model_name)
        model, params = create_model(cfg, dtype=jnp.bfloat16)
        teacher = jax.tree.map(jnp.copy, params)
        sched = make_schedule("cosine", 1e-5, warmup=100, total_steps=10000)
        tx = build_optimizer(
            params, sched, wd=0.1,
            unlocked_groups=cfg.vision.layers, num_layers=cfg.vision.layers,
        )
        step = make_train_step(
            model, tx, clipself_loss, mesh=None,
            trainable=trainable_labels(
                params, unlocked_groups=cfg.vision.layers,
                num_layers=cfg.vision.layers,
            ),
        )
        state = TrainState.create(params, tx)
        key = jax.random.PRNGKey(0)

        it = device_prefetch(iter(loader), mesh=None, size=2)
        # warmup: compile on the first prefetched batch
        batch = next(it)
        state, metrics = step(state, teacher, batch, key)
        print("warmup loss:", float(metrics["loss"]), file=sys.stderr)

        # component rate 1: device-only (re-stepping the staged batch)
        t0 = time.perf_counter()
        for _ in range(6):
            state, metrics = step(state, teacher, batch, key)
        _ = float(metrics["loss"])
        dev_ips = b * 6 / (time.perf_counter() - t0)

        # sustained end-to-end: loader -> prefetch -> step. The generator's
        # next() covers loader wait + device_put (the host side of the
        # pipeline); timing it separately attributes the host/device split
        # of the sustained number.
        t0 = time.perf_counter()
        n = 0
        host_s = 0.0
        while True:
            th = time.perf_counter()
            try:
                batch = next(it)
            except StopIteration:
                break
            host_s += time.perf_counter() - th
            state, metrics = step(state, teacher, batch, key)
            n += 1
            if n >= n_batches:
                break
        _ = float(metrics["loss"])
        dt = time.perf_counter() - t0
        e2e_ips = b * n / dt
        host_ms = host_s / max(n, 1) * 1000.0

        # component rate 2: loader-only (a second loader instance with its
        # own thread pools — the first one's generator still owns pending
        # double-buffer submissions)
        loader2 = NativeDistillLoader(ds, b, shuffle=True, num_threads=threads)
        it2 = iter(loader2)
        next(it2)  # spin up the double buffer
        t0 = time.perf_counter()
        for i, _batch in enumerate(it2):
            if i + 1 >= n_batches:
                break
        loader_ips = b * (n_batches - 1) / (time.perf_counter() - t0)

    # threads needed for the host to keep up with the device step
    per_thread = loader_ips / max(threads, 1)
    crossover = dev_ips / per_thread if per_thread > 0 else float("inf")
    result = {
        "metric": (
            f"images/sec sustained, end-to-end distill loop "
            f"(native loader {threads} threads -> device prefetch -> jitted "
            f"step, {model_name} {det}px)"
        ),
        "value": round(e2e_ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(e2e_ips / BASELINE_PER_CHIP, 4),
        "device_only_img_s": round(dev_ips, 2),
        "loader_only_img_s": round(loader_ips, 2),
        "host_ms_per_batch": round(host_ms, 1),
        "crossover_threads": round(crossover, 1),
    }
    print(json.dumps(result))
    return result


def bench_eval():
    """BENCH_EVAL=1: zero-shot region-classification eval throughput on chip.

    The evaluator pads every image to max_anns boxes+crops+masks
    (`eval/zero_shot.py`); the reference ran batch-size 1 precisely because
    of raggedness, so the padded redesign's on-chip cost is worth measuring
    at reference scale: COCO-Panoptic val is ~5k images with max_anns
    auto-capped at 100 (datasets.py:341-344). Distinct synthetic batches
    (tunnel-memoization guard) flow through evaluate_zero_shot itself,
    including the host-side metric stage.

    Batches are pre-staged on device, exactly like the train bench: the
    production loader overlaps host->device transfers with compute
    (`data/loader.py` device prefetch), and on this dev box the tunnel has
    a pathological slow path for >64MB buffers (120MB crops array: 3.0s,
    ~40 MB/s, vs ~1 GB/s at 32MB) that would otherwise swamp the measurement.
    The evaluator's per-batch logits fetch (np.asarray) forces each batch's
    compute, so the timing is honest device time."""
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_COMPILE_CACHE", "/root/.cache/jax_compilation")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from clipself_tpu.core.config import get_model_config
    from clipself_tpu.eval.zero_shot import evaluate_zero_shot
    from clipself_tpu.models.factory import create_model

    b = int(os.environ.get("BENCH_EVAL_BATCH", "2"))
    m = int(os.environ.get("BENCH_EVAL_ANNS", "100"))
    # valid anns per image (rest are zero padding, like real panoptic items:
    # COCO val averages ~13 segments against the 100-slot pad). The evaluator
    # buckets the ann axis per batch, so this drives the measured width.
    mv = int(os.environ.get("BENCH_EVAL_VALID", str(m)))
    det = int(os.environ.get("BENCH_IMAGE_SIZE", "1024"))
    crop = int(os.environ.get("BENCH_CROP_SIZE", "224"))
    n_batches = int(os.environ.get("BENCH_EVAL_BATCHES", "8"))
    n_classes = 133  # COCO-Panoptic
    model_name = os.environ.get("BENCH_MODEL", "EVA02-CLIP-B-16")

    cfg = get_model_config(model_name)
    model, params = create_model(cfg, dtype=jnp.bfloat16)
    mask_hw = det // cfg.vision.patch_size
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((n_classes, cfg.embed_dim)).astype(np.float32)

    def make_batch(i):
        r = np.random.default_rng(i + 1)
        lo = r.uniform(0, 0.5, size=(b, m, 2)).astype(np.float32)
        hi = np.clip(lo + r.uniform(0.05, 0.5, size=(b, m, 2)), 0, 1)
        boxes = np.zeros((b, m, 8), np.float32)
        boxes[..., :4] = np.concatenate([lo, hi], -1)
        boxes[..., 4] = r.integers(0, n_classes, size=(b, m))  # label
        boxes[..., 5] = (np.arange(m) < mv).astype(np.float32)[None, :]  # valid
        boxes[..., 7] = r.integers(0, 2, size=(b, m))  # isthing
        masks = (r.uniform(size=(b, m, mask_hw, mask_hw)) < 0.2).astype(np.float32)
        return {
            # images/crops/gt_masks pre-staged on device (see docstring);
            # boxes stay host-side: the evaluator reads labels/valid/isthing
            # columns on host before slicing the xyxy part to device
            "images": jnp.asarray(r.standard_normal((b, det, det, 3)).astype(np.float32)),
            "boxes": boxes,
            "crops": jnp.asarray(r.standard_normal((b, m, crop, crop, 3)).astype(np.float32)),
            "gt_masks": jnp.asarray(masks),
        }

    batches = [make_batch(i) for i in range(n_batches)]
    # warmup/compile on a separate batch, then time the full evaluator pass
    res = evaluate_zero_shot(model, params, batches[:1], emb)
    assert res, "evaluator produced no results"
    t0 = time.perf_counter()
    res = evaluate_zero_shot(model, params, batches, emb)
    dt = time.perf_counter() - t0
    assert all(np.isfinite(v) for v in res.values())

    ips = b * n_batches / dt
    result = {
        "metric": f"images/sec/chip, {model_name} zero-shot panoptic eval "
                  f"({det}px, {mv} valid of {m} padded anns: "
                  f"rois+maskpool+crops@{crop}px)",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        # 5k panoptic val images per eval epoch; minutes on one chip as context
        "vs_baseline": round(ips / BASELINE_PER_CHIP, 4),
        "eval_5k_minutes_per_chip": round(5000 / ips / 60, 1),
    }
    print(json.dumps(result))
    return result


def _run_recipe_subprocess(env_overrides: dict, timeout: int = 1200):
    """Run one bench recipe in a fresh subprocess (clean device state per
    recipe) and return its parsed JSON line, or None on failure."""
    import subprocess

    env = dict(os.environ)
    env.update({k: str(v) for k, v in env_overrides.items()})
    env.setdefault("BENCH_SECOND_TOWER", "0")
    env.setdefault("BENCH_RECIPES", "0")  # no recursion
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"recipe subprocess failed: {e}", file=sys.stderr)
    return None


def bench_recipes() -> dict:
    """Every non-default recipe as one number each, for BENCH_r*.json
    regression tracking (VERDICT r3 #6). Each runs in its own subprocess
    (model build + cached compile + a short timed loop)."""
    recipes = {}
    specs = {
        "multiscale": {"BENCH_MULTISCALE": "1"},
        "region_clip": {"BENCH_METHOD": "region_clip"},
        "remat": {"BENCH_REMAT": "1"},
        "eval": {"BENCH_EVAL": "1"},
        # COCO-average ann count (~13 valid of the 100-slot pad): the
        # number the 5k-image eval epoch actually runs at (VERDICT r4 #8)
        "eval_avg_anns": {"BENCH_EVAL": "1", "BENCH_EVAL_VALID": "13"},
        # the L/14-336 eval recipe (test_eva_vitl14_macc_boxes_masks.sh:
        # 896px dense pass + 336px crop encodes), run as the eval script
        # ships (no per-recipe knob exports; the knob A/Bs live in PERF.md)
        # — VERDICT r4 #4
        "eval_l14": {
            "BENCH_EVAL": "1", "BENCH_MODEL": "EVA02-CLIP-L-14-336",
            "BENCH_IMAGE_SIZE": "896", "BENCH_CROP_SIZE": "336",
        },
        "detector": {"BENCH_DETECTOR": "1"},
        "detector_lvis": {"BENCH_DETECTOR": "1", "BENCH_DET_PRESET": "ov_lvis_vitb16"},
        "detector_vitl14": {"BENCH_DETECTOR": "1", "BENCH_DET_PRESET": "ov_coco_vitl14"},
        "e2e": {"BENCH_E2E": "1"},
    }
    for name, env in specs.items():
        # the detector graphs are the slowest compiles and the tunnel's
        # remote-compile latency is bimodal (see PERF.md) — give those
        # subprocesses the most room
        r = _run_recipe_subprocess(
            env, timeout=3000 if name.startswith("detector") else 1800
        )
        if r is not None:
            recipes[name] = r["value"]
            for extra in ("predict_img_s", "eval_5k_minutes_per_chip",
                          "host_ms_per_batch", "device_only_img_s"):
                if extra in r:
                    recipes[f"{name}_{extra}"] = r[extra]
        else:
            recipes[name] = None
        print(f"recipe {name}: {recipes.get(name)}", file=sys.stderr)
    return recipes


def main():
    if os.environ.get("BENCH_LOADER", "0") == "1":
        return bench_loader()
    if os.environ.get("BENCH_EVAL", "0") == "1":
        return bench_eval()
    if os.environ.get("BENCH_DETECTOR", "0") == "1":
        return bench_detector()
    if os.environ.get("BENCH_CHIP_PARITY", "0") == "1":
        # on-chip bf16+flash drift vs reference CPU goldens -> PARITY_CHIP.md
        from clipself_tpu.tools.chip_parity import main as parity_main

        return parity_main()
    # bench the B/16 recipes as shipped: the train scripts export bf16
    # teacher-attention logits (+1% measured; knob default-off globally on
    # round-4 advisor advice). Applies to the default distill leg AND the
    # E2E mode (the same B/16 train loop behind the loader).
    had_hl = "CLIPSELF_XLA_ATTN_HALF_LOGITS" in os.environ
    os.environ.setdefault("CLIPSELF_XLA_ATTN_HALF_LOGITS", "1")
    try:
        if os.environ.get("BENCH_E2E", "0") == "1":
            return bench_e2e()
        result = _bench_distill()
    finally:
        if not had_hl:
            del os.environ["CLIPSELF_XLA_ATTN_HALF_LOGITS"]
    # Track BOTH shipped towers: half the reference's recipes train the
    # L/14-336 student at 896px (train_*_eva_vitl14.sh). Unless the caller
    # pinned a model (an A/B run) or opted out, append the L/14 line to the
    # same JSON record so BENCH_r*.json captures both.
    second = (
        "BENCH_MODEL" not in os.environ
        and os.environ.get("BENCH_SECOND_TOWER", "1") == "1"
    )
    if second:
        os.environ["BENCH_MODEL"] = "EVA02-CLIP-L-14-336"
        os.environ["BENCH_IMAGE_SIZE"] = "896"
        os.environ["BENCH_CROP_SIZE"] = "336"
        # bench the recipe as shipped: the L/14 train scripts export the
        # fused-LN knob (measured +1.4% on the 24-layer tower, PERF.md;
        # default-off globally because B/16 measures -2.4%), bf16 teacher
        # logits, and the 128-wide query-chunked teacher attention
        # (round 5, +2% on the 577-token crops; L/14-only)
        recipe_env = {
            "CLIPSELF_PALLAS_LN": "1",
            "CLIPSELF_XLA_ATTN_HALF_LOGITS": "1",
            "CLIPSELF_XLA_ATTN_CHUNK_Q": "128",
        }
        had = {k: k in os.environ for k in recipe_env}
        for k, v in recipe_env.items():
            os.environ.setdefault(k, v)
        try:
            l14 = _bench_distill()
            result["l14_336_896px_img_s"] = l14["value"]
            result["l14_336_896px_vs_baseline"] = l14["vs_baseline"]
        finally:
            for k in ("BENCH_MODEL", "BENCH_IMAGE_SIZE", "BENCH_CROP_SIZE"):
                del os.environ[k]
            for k in recipe_env:
                if not had[k]:
                    del os.environ[k]
    # non-default recipes (multiscale / region_clip / remat / eval /
    # detector), one subprocess each. On by default for the driver's
    # end-of-round record; A/B runs that pin BENCH_MODEL skip it, and
    # BENCH_RECIPES=0 opts out explicitly.
    if second and os.environ.get("BENCH_RECIPES", "1") == "1":
        result["recipes"] = bench_recipes()
    print(json.dumps(result))
    return result


def _bench_distill():
    import jax

    # persistent compilation cache: repeated bench runs skip the (slow)
    # remote compile
    cache_dir = os.environ.get("JAX_COMPILE_CACHE", "/root/.cache/jax_compilation")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from clipself_tpu.core.config import get_model_config
    from clipself_tpu.models.factory import create_model
    from clipself_tpu.train.methods import clipself_loss
    from clipself_tpu.train.optim import build_optimizer, make_schedule
    from clipself_tpu.train.step import TrainState, make_train_step

    batch_size = int(os.environ.get("BENCH_BATCH", "2"))  # b=2 measured fastest per chip (13.0 vs 11.8 at b=4); also the reference per-device batch
    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", "1024"))
    crop_size = int(os.environ.get("BENCH_CROP_SIZE", "224"))
    max_boxes = int(os.environ.get("BENCH_MAX_BOXES", "20"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    if remat:
        # remat pipelines the fused backward deeper; 1536 kv blocks overflow
        # the 16MB scoped-VMEM budget that the non-remat graph fits
        os.environ.setdefault("CLIPSELF_FLASH_BWD_BLOCK_K", "768")
    # BENCH_MULTISCALE=1 benches the reference's --multiscale recipe
    # (`clipself.py:17-27`: each step trains at a random size from
    # {320,640,896,1024}); we cycle the sizes deterministically, which has
    # the same expected cost as the uniform draw. One compiled step per size.
    multiscale = os.environ.get("BENCH_MULTISCALE", "0") == "1"

    # BENCH_MODEL=EVA02-CLIP-L-14-336 BENCH_IMAGE_SIZE=896 BENCH_CROP_SIZE=336
    # benches the L/14 recipe (reference train_*_eva_vitl14.sh shapes)
    model_name = os.environ.get("BENCH_MODEL", "EVA02-CLIP-B-16")
    # BENCH_METHOD=region_clip benches the RegionCLIP recipe (no teacher
    # crops; box features vs fixed noun embeddings, federated BCE)
    method = os.environ.get("BENCH_METHOD", "clipself")
    cfg = get_model_config(model_name)
    model, params = create_model(cfg, dtype=jnp.bfloat16, remat=remat)
    teacher = jax.tree.map(jnp.copy, params)  # true copies: the step donates state.params, which must not alias the teacher

    if method == "region_clip":
        import functools

        from clipself_tpu.train.methods import regionclip_loss

        nouns = np.random.default_rng(1).standard_normal((4764, cfg.embed_dim))
        nouns /= np.linalg.norm(nouns, axis=-1, keepdims=True)
        loss_fn = functools.partial(
            regionclip_loss, noun_embeddings=jnp.asarray(nouns, jnp.float32)
        )
    else:
        loss_fn = clipself_loss

    sched = make_schedule("cosine", 1e-5, warmup=100, total_steps=10000)
    # BENCH_OPT=sgd: diagnostic A/B that swaps AdamW for plain SGD to bound
    # the optimizer-update share of the step (adam moves ~28 B/param of f32
    # moment+param traffic vs sgd's 12 B/param; the delta isolates it).
    if os.environ.get("BENCH_OPT") == "sgd":
        import optax

        from clipself_tpu.train.optim import trainable_labels as _tl

        tx = optax.multi_transform(
            {"train": optax.sgd(sched), "freeze": optax.set_to_zero()},
            _tl(params, unlocked_groups=cfg.vision.layers,
                num_layers=cfg.vision.layers),
        )
    else:
        tx = build_optimizer(
            params, sched, wd=0.1,
            unlocked_groups=cfg.vision.layers, num_layers=cfg.vision.layers,
        )
    from clipself_tpu.train.optim import trainable_labels

    step = make_train_step(
        model, tx, loss_fn, mesh=None,
        trainable=trainable_labels(
            params, unlocked_groups=cfg.vision.layers,
            num_layers=cfg.vision.layers,
        ),
    )
    state = TrainState.create(params, tx)

    rng = np.random.default_rng(0)
    b, m = batch_size, max_boxes
    lo = rng.uniform(0, 0.5, size=(b, m, 2)).astype(np.float32)
    hi = np.clip(lo + rng.uniform(0.05, 0.5, size=(b, m, 2)), 0, 1).astype(np.float32)
    if method == "region_clip":
        # [xyxy, class label, valid] — no teacher crops in this recipe
        cls = rng.integers(0, 4764, size=(b, m, 1)).astype(np.float32)
        boxes = jax.device_put(
            np.concatenate([lo, hi, cls, np.ones((b, m, 1), np.float32)], -1)
        )
        crops = None
    else:
        boxes = jax.device_put(np.concatenate([lo, hi, np.ones((b, m, 1), np.float32)], -1))
        crops = jax.device_put(
            rng.standard_normal((b, m, crop_size, crop_size, 3), dtype=np.float32)
        )

    if multiscale:
        from clipself_tpu.train.methods import multiscale_sizes

        sizes = multiscale_sizes(image_size)
        # round UP to a multiple of the ladder: equal coverage of every size,
        # and a too-small BENCH_STEPS can never zero the timed loop
        steps += (-steps) % len(sizes)
    else:
        sizes = (image_size,)
    # NOTE: float32 numpy -> device_put is a pure buffer transfer; the model
    # casts to bf16 on device (big f64 constants would blow the compile RPC).
    batches = [
        {
            "images": jax.device_put(
                rng.standard_normal((b, s, s, 3), dtype=np.float32)
            ),
            "boxes": boxes,
            **({"crops": crops} if crops is not None else {}),
        }
        for s in sizes
    ]
    key = jax.random.PRNGKey(0)

    # warmup / compile (each size is its own compiled step)
    for batch in batches:
        state, metrics = step(state, teacher, batch, key)
        print(f"warmup loss @{batch['images'].shape[1]}:",
              float(metrics["loss"]), file=sys.stderr)
    state, metrics = step(state, teacher, batches[0], key)
    jax.block_until_ready(metrics["loss"])

    # BENCH_PROFILE_DIR: capture a device trace of the timed loop, then
    # summarize with `python -m clipself_tpu.tools.trace_summary <dir>
    # --steps $BENCH_STEPS` (the reproducible source of PERF.md's per-HLO
    # tables)
    prof_dir = os.environ.get("BENCH_PROFILE_DIR")
    if prof_dir:
        jax.profiler.start_trace(prof_dir)
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, teacher, batches[i % len(batches)], key)
    # fetching the value forces the full chain to complete
    final_loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    if prof_dir:
        jax.profiler.stop_trace()
        print(f"trace written to {prof_dir}", file=sys.stderr)
    assert np.isfinite(final_loss), f"non-finite loss {final_loss}"

    imgs_per_sec = batch_size * steps / dt
    tag = (
        f"multiscale {'/'.join(str(s) for s in sizes)}px"
        if multiscale else f"{image_size}px"
    )
    result = {
        "metric": (
            f"images/sec/chip, {model_name} RegionCLIP step ({tag}, {max_boxes} boxes)"
            if method == "region_clip"
            else f"images/sec/chip, {model_name} CLIPSelf distill step ({tag}, {max_boxes} crops)"
        ),
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / BASELINE_PER_CHIP, 4),
    }
    # free this tower's device state before a possible second-tower bench
    del state, teacher, batches, step
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
