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
