"""bench.py is the driver's perf entry point — keep it runnable.

Runs the bench main() on the tiny test model at toy shapes (CPU), for every
mode: default, multiscale, and region_clip.
"""

import importlib.util
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench)

TINY_ENV = {
    "BENCH_MODEL": "EVA02-CLIP-Tiny-Test",
    "BENCH_IMAGE_SIZE": "64",
    "BENCH_CROP_SIZE": "32",
    "BENCH_BATCH": "2",
    "BENCH_MAX_BOXES": "4",
    "BENCH_STEPS": "4",
}


@pytest.mark.parametrize(
    "extra",
    [{}, {"BENCH_MULTISCALE": "1"}, {"BENCH_METHOD": "region_clip"}],
    ids=["default", "multiscale", "region_clip"],
)
def test_bench_main(monkeypatch, extra):
    for k, v in {**TINY_ENV, **extra}.items():
        monkeypatch.setenv(k, v)
    result = bench.main()
    assert result["unit"] == "images/sec/chip"
    assert result["value"] > 0
    assert "vs_baseline" in result


def test_bench_eval_mode(monkeypatch):
    for k, v in {
        **TINY_ENV,
        "BENCH_EVAL": "1",
        "BENCH_EVAL_BATCH": "2",
        "BENCH_EVAL_ANNS": "4",
        "BENCH_EVAL_BATCHES": "2",
    }.items():
        monkeypatch.setenv(k, v)
    result = bench.main()
    assert result["unit"] == "images/sec/chip"
    assert result["value"] > 0
    assert result["eval_5k_minutes_per_chip"] > 0
