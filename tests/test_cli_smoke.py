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
    """Tiny on-disk COCO-format corpus: train instances JSON + images,
    panoptic val JSON + segment PNGs, and a classifier embedding matrix."""
    import json as _json

    from PIL import Image

    img_dir = root / "images"
    seg_dir = root / "segm"
    img_dir.mkdir()
    seg_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations, pan_annotations = [], [], []
    for i in range(8):
        w, h = 80, 64
        Image.fromarray(
            rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        ).save(img_dir / f"img{i}.jpg")
        images.append({"id": i, "file_name": f"img{i}.jpg", "width": w, "height": h})
        annotations.append(
            {"id": i, "image_id": i, "category_id": 1, "bbox": [5, 5, 30, 25], "area": 750}
        )
        seg = np.zeros((h, w, 3), np.uint8)
        seg[: h // 2, :, 0] = 1
        seg[h // 2 :, :, 0] = 2
        Image.fromarray(seg).save(seg_dir / f"img{i}.png")
        pan_annotations.append(
            {
                "image_id": i,
                "file_name": f"img{i}.png",
                "segments_info": [
                    {"id": 1, "category_id": 1, "bbox": [0, 0, w, h // 2], "area": w * h // 2},
                    {"id": 2, "category_id": 2, "bbox": [0, h // 2, w, h // 2], "area": w * h // 2},
                ],
            }
        )
    cats = [
        {"id": 1, "name": "thing_a", "isthing": 1},
        {"id": 2, "name": "stuff_b", "isthing": 0},
    ]
    with open(root / "instances.json", "w") as f:
        _json.dump({"images": images, "annotations": annotations, "categories": cats}, f)
    with open(root / "panoptic.json", "w") as f:
        _json.dump({"images": images, "annotations": pan_annotations, "categories": cats}, f)
    emb = rng.normal(size=(2, 64)).astype(np.float32)  # tiny model embed_dim
    np.save(root / "emb.npy", emb)
    return img_dir, seg_dir


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
