"""End-to-end trainer CLI smoke test on synthetic data (8-device CPU mesh)."""

import json
import os

import numpy as np

from clipself_tpu.train.main import main


def test_synthetic_train_smoke(tmp_path):
    logs = str(tmp_path / "logs")
    main(
        [
            "--model", "EVA02-CLIP-Tiny-Test",
            "--synthetic",
            "--steps-per-epoch", "3",
            "--epochs", "1",
            "--det-image-size", "64",
            "--batch-size", "8",
            "--max-boxes", "4",
            "--warmup", "1",
            "--lr", "1e-3",
            "--zeroshot-frequency", "0",
            "--save-frequency", "1",
            "--alpha", "0.7",
            "--precision", "fp32",
            "--lock-image-unlocked-groups", "2",
            "--name", "smoke",
            "--logs", logs,
            "--log-every-n-steps", "1",
            "--export-torch",
        ]
    )
    out = os.path.join(logs, "smoke")
    assert os.path.exists(os.path.join(out, "params.txt"))
    assert os.path.exists(os.path.join(out, "checkpoints"))
    assert os.path.exists(os.path.join(out, "epoch_1.pt"))


def test_synthetic_resume(tmp_path):
    logs = str(tmp_path / "logs")
    common = [
        "--model", "EVA02-CLIP-Tiny-Test", "--synthetic",
        "--steps-per-epoch", "2", "--det-image-size", "64",
        "--batch-size", "8", "--max-boxes", "4", "--warmup", "1",
        "--zeroshot-frequency", "0", "--precision", "fp32",
        "--lock-image-unlocked-groups", "2", "--logs", logs,
    ]
    main(common + ["--epochs", "1", "--name", "r1"])
    ckpt_dir = os.path.join(logs, "r1", "checkpoints")
    main(common + ["--epochs", "2", "--name", "r2", "--resume", ckpt_dir])


def _write_micro_coco(root):
    from tests.conftest import write_micro_coco

    # fixed 80x64 images, 1 ann each, embed dim matching the tiny model
    return write_micro_coco(
        root, n_images=8, image_size=(80, 64), anns_per_image=1, embed_dim=64
    )


def test_coco_micro_subset_end_to_end(tmp_path):
    """BASELINE.json config #1: CLIPSelf image-patch distill on a COCO-format
    micro-subset, CPU-runnable, through the REAL file-based pipeline — train
    JSON + images, panoptic val JSON + segment PNGs, text-embedding classifier,
    eval-before-train and post-epoch zero-shot eval, checkpoint + results."""
    root = tmp_path
    img_dir, seg_dir = _write_micro_coco(root)
    logs = str(root / "logs")
    main(
        [
            "--model", "EVA02-CLIP-Tiny-Test",
            "--dataset-type", "grid_distill",
            "--train-data", str(root / "instances.json"),
            "--train-image-root", str(img_dir),
            "--val-data", str(root / "panoptic.json"),
            "--val-image-root", str(img_dir),
            "--val-segm-root", str(seg_dir),
            "--embed-path", str(root / "emb.npy"),
            "--det-image-size", "64",
            "--batch-size", "8", "--max-boxes", "4",
            "--epochs", "1", "--warmup", "1", "--lr", "1e-4",
            "--zeroshot-frequency", "1", "--precision", "fp32",
            "--lock-image-unlocked-groups", "2", "--alpha", "0.7",
            "--workers", "0", "--name", "micro", "--logs", logs,
        ]
    )
    out = os.path.join(logs, "micro")
    assert os.path.exists(os.path.join(out, "checkpoints"))
    results = os.path.join(out, "results.jsonl")
    assert os.path.exists(results)
    lines = [json.loads(l) for l in open(results)]
    # eval-before-train + post-epoch eval (reference main.py:263-269)
    assert len(lines) >= 2
    keys = set(lines[-1])
    assert any("rois" in k for k in keys)
    assert any("maskpool" in k for k in keys)


def test_detector_dataset_preset_guard():
    """A dataset registry whose size mismatches the preset's num_classes must
    be rejected up front: the background label (num_classes) would be an
    out-of-bounds gather index, which JAX fills with NaN in the cls loss."""
    import pytest

    from clipself_tpu.detector.train import parse_args as det_parse
    from clipself_tpu.detector.train import main as det_main

    args = det_parse(["--preset", "ov_lvis_vitb16", "--synthetic"])
    assert args.dataset is None  # inferred later from the preset

    with pytest.raises(SystemExit, match="1203"):
        det_main(["--preset", "ov_lvis_vitb16", "--dataset", "coco", "--synthetic"])


def test_synthetic_multiscale_smoke(tmp_path):
    """--multiscale (reference `clipself.py:17-27`): each step trains at a
    random size from the ladder; every size is its own compiled step."""
    logs = str(tmp_path / "logs")
    main(
        [
            "--model", "EVA02-CLIP-Tiny-Test",
            "--synthetic",
            "--multiscale",
            "--steps-per-epoch", "4",
            "--epochs", "1",
            "--det-image-size", "64",
            "--batch-size", "8",
            "--max-boxes", "4",
            "--warmup", "1",
            "--zeroshot-frequency", "0",
            "--precision", "fp32",
            "--lock-image-unlocked-groups", "2",
            "--name", "ms",
            "--logs", logs,
        ]
    )
    assert os.path.exists(os.path.join(logs, "ms", "checkpoints"))


def test_eval_only_mode(tmp_path):
    """No --train-data => single zero-shot evaluation and exit (reference
    `main.py:265-268`, used by `scripts/test_eva_vit*_macc_boxes_masks.sh`)."""
    root = tmp_path
    img_dir, seg_dir = _write_micro_coco(root)
    logs = str(root / "logs")
    main(
        [
            "--model", "EVA02-CLIP-Tiny-Test",
            "--val-data", str(root / "panoptic.json"),
            "--val-image-root", str(img_dir),
            "--val-segm-root", str(seg_dir),
            "--embed-path", str(root / "emb.npy"),
            "--det-image-size", "64",
            "--max-boxes", "4",
            "--zeroshot-frequency", "1",
            "--precision", "fp32",
            "--workers", "0",
            "--name", "evalonly",
            "--logs", logs,
        ]
    )
    results = os.path.join(logs, "evalonly", "results.jsonl")
    assert os.path.exists(results)
    lines = [json.loads(l) for l in open(results)]
    assert len(lines) == 1  # exactly one eval, no training
    assert any("rois" in k for k in lines[0])


def test_const_cooldown_scheduler(tmp_path):
    """--lr-scheduler const-cooldown must be usable from the CLI (its
    cooldown_steps are derived from --epochs-cooldown or epochs//4)."""
    main(
        [
            "--model", "EVA02-CLIP-Tiny-Test",
            "--synthetic",
            "--lr-scheduler", "const-cooldown",
            "--epochs-cooldown", "1",
            "--steps-per-epoch", "2",
            "--epochs", "2",
            "--det-image-size", "64",
            "--batch-size", "8",
            "--max-boxes", "4",
            "--warmup", "1",
            "--zeroshot-frequency", "0",
            "--save-frequency", "0",
            "--precision", "fp32",
            "--lock-image-unlocked-groups", "2",
            "--name", "cooldown",
            "--logs", str(tmp_path / "logs"),
        ]
    )


def test_save_most_recent_and_resume_auto(tmp_path):
    """--save-most-recent keeps a rolling latest checkpoint every epoch
    (reference main.py:323-328), and --resume auto picks the newest epoch
    across the periodic and rolling dirs."""
    logs = str(tmp_path / "logs")
    common = [
        "--model", "EVA02-CLIP-Tiny-Test", "--synthetic",
        "--steps-per-epoch", "2", "--det-image-size", "64",
        "--batch-size", "8", "--max-boxes", "4", "--warmup", "1",
        "--zeroshot-frequency", "0", "--precision", "fp32",
        "--lock-image-unlocked-groups", "2", "--logs", logs,
        "--name", "smr", "--save-most-recent",
    ]
    # save-frequency 5 > epochs: epoch 1 gets NO periodic save mid-run, but
    # the rolling latest exists after every epoch
    main(common + ["--epochs", "2", "--save-frequency", "5"])
    out = os.path.join(logs, "smr")
    latest_dir = os.path.join(out, "checkpoints_latest")
    assert os.path.isdir(latest_dir)
    from clipself_tpu.train.checkpoint import latest_epoch

    assert latest_epoch(latest_dir) == 2
    # rolling manager retains only the newest epoch
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.abspath(latest_dir))
    assert list(mgr.all_steps()) == [2]
    mgr.close()
    # resume auto continues from the rolling dir's epoch
    main(common + ["--epochs", "3", "--save-frequency", "5", "--resume", "auto"])
    assert latest_epoch(latest_dir) == 3


def test_force_patch_dropout_smoke(tmp_path):
    """--force-patch-dropout overrides the config and trains through the
    patch-dropout student path (reference factory.py:174-176)."""
    logs = str(tmp_path / "logs")
    main(
        [
            "--model", "EVA02-CLIP-Tiny-Test", "--synthetic",
            "--force-patch-dropout", "0.5",
            "--steps-per-epoch", "2", "--epochs", "1",
            "--det-image-size", "64", "--batch-size", "8",
            "--max-boxes", "4", "--warmup", "1",
            "--zeroshot-frequency", "0", "--save-frequency", "0",
            "--precision", "fp32", "--lock-image-unlocked-groups", "2",
            "--name", "fpd", "--logs", logs,
        ]
    )
    recorded = open(os.path.join(logs, "fpd", "params.txt")).read()
    assert "force_patch_dropout: 0.5" in recorded


def test_pretrained_image_requires_timm_tower():
    """--pretrained-image is timm-towers-only, as in the reference
    (factory.py:182-187 asserts)."""
    import pytest

    with pytest.raises(AssertionError, match="timm models"):
        main(
            [
                "--model", "EVA02-CLIP-Tiny-Test", "--synthetic",
                "--pretrained-image", "--steps-per-epoch", "1",
                "--epochs", "1", "--batch-size", "8", "--precision", "fp32",
            ]
        )


def test_freeze_bn_stats_labels():
    """--lock-image-freeze-bn-stats masks BN running stats from the optimizer
    even inside unlocked ResNet groups (reference main.py:165)."""
    import jax.numpy as jnp

    from clipself_tpu.core.config import CLIPConfig, TextConfig, VisionConfig
    from clipself_tpu.models.factory import create_model
    from clipself_tpu.train.optim import trainable_labels

    cfg = CLIPConfig(
        embed_dim=48,
        vision=VisionConfig(image_size=64, layers=4, width=8, head_width=64,
                            patch_size=32, resnet_layers=(1, 1, 1, 1)),
        text=TextConfig(context_length=8, vocab_size=64, width=32, heads=2, layers=1),
        name="tiny-rn-bn",
    )
    _, params = create_model(cfg, dtype=jnp.float32)
    # all groups unlocked: without the flag, BN stats would train with their
    # group; with it they stay frozen
    free = trainable_labels(params, unlocked_groups=5, num_layers=4,
                            freeze_bn_stats=False)
    frozen = trainable_labels(params, unlocked_groups=5, num_layers=4,
                              freeze_bn_stats=True)
    assert free["visual"]["layer4_0"]["bn1"]["mean"] == "train"
    assert frozen["visual"]["layer4_0"]["bn1"]["mean"] == "freeze"
    assert frozen["visual"]["layer4_0"]["bn1"]["var"] == "freeze"
    # learnable BN affine params still train
    assert frozen["visual"]["layer4_0"]["bn1"]["scale"] == "train"
    assert frozen["visual"]["layer4_0"]["downsample_bn"]["mean"] == "freeze"


def test_image_ave_pool_eval(tmp_path, monkeypatch):
    """--image-ave-pool reaches the evaluator (reference zero_shot.py:78);
    the branch itself (dense-map mean + renormalize vs encode_image) is
    exercised end-to-end and produces valid metrics."""
    root = tmp_path
    img_dir, seg_dir = _write_micro_coco(root)
    logs = str(root / "logs")
    common = [
        "--model", "EVA02-CLIP-Tiny-Test",
        "--val-data", str(root / "panoptic.json"),
        "--val-image-root", str(img_dir),
        "--val-segm-root", str(seg_dir),
        "--embed-path", str(root / "emb.npy"),
        "--det-image-size", "64", "--max-boxes", "4",
        "--zeroshot-frequency", "1", "--precision", "fp32",
        "--workers", "0", "--logs", logs,
    ]
    seen = {}
    import clipself_tpu.eval.zero_shot as zs

    real = zs.evaluate_zero_shot

    def recording(*a, **kw):
        seen["image_ave_pool"] = kw.get("image_ave_pool")
        seen["extract_type"] = kw.get("extract_type")
        return real(*a, **kw)

    monkeypatch.setattr(zs, "evaluate_zero_shot", recording)
    main(common + ["--name", "avepool", "--image-ave-pool", "--extract-type", "v1"])
    assert seen == {"image_ave_pool": True, "extract_type": "v1"}
    results = json.loads(open(os.path.join(logs, "avepool", "results.jsonl")).read())
    assert any("crop" in k for k in results)


def test_logging_and_scheduler_flags(tmp_path):
    """--debug/--log-local write per-rank DEBUG logs; --skip-scheduler holds
    the LR at the base value (reference main.py:88-99, train.py:84);
    --force-quick-gelu swaps the activation (reference main.py:125)."""
    logs = str(tmp_path / "logs")
    main(
        [
            "--model", "EVA02-CLIP-Tiny-Test", "--synthetic",
            "--debug", "--log-local", "--skip-scheduler", "--force-quick-gelu",
            "--test-type", "coco_panoptic", "--downsample-factor", "8",
            "--steps-per-epoch", "2", "--epochs", "1",
            "--det-image-size", "64", "--batch-size", "8",
            "--max-boxes", "4", "--lr", "1e-3",
            "--zeroshot-frequency", "0", "--save-frequency", "0",
            "--precision", "fp32", "--lock-image-unlocked-groups", "2",
            "--name", "flags", "--logs", logs, "--log-every-n-steps", "1",
        ]
    )
    out = os.path.join(logs, "flags")
    # --log-local: rank-0 file is out-0.log, not out.log
    text = open(os.path.join(out, "out-0.log")).read()
    assert not os.path.exists(os.path.join(out, "out.log"))
    # --skip-scheduler: logged LR equals the base LR at every step (a cosine
    # schedule with warmup 1000 over 2 steps would log ~1e-6, not 1e-3)
    assert "lr 1.000e-03" in text
    recorded = open(os.path.join(out, "params.txt")).read()
    assert "skip_scheduler: True" in recorded
    assert "force_quick_gelu: True" in recorded
    assert "downsample_factor: 8" in recorded
