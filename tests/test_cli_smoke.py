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
