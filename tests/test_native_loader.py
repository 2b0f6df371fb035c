"""Native C++ loader: decode/resize/normalize parity with the PIL pipeline."""

import numpy as np
import pytest
from PIL import Image

from clipself_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(
    not (nl.available() or nl.build_native()), reason="native loader not built"
)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    # smooth image so jpeg loss is small
    base = rng.uniform(0, 255, (7, 9, 3))
    arr = np.asarray(
        Image.fromarray(base.astype(np.uint8)).resize((90, 70), Image.BILINEAR)
    )
    jpg = d / "a.jpg"
    Image.fromarray(arr).save(jpg, quality=95)
    png = d / "b.png"
    Image.fromarray(arr).save(png)
    return str(jpg), str(png), arr


def test_decode_png_exact(images):
    _, png, arr = images
    out = nl.decode(png)
    np.testing.assert_array_equal(out, arr)


def test_decode_jpeg_close(images):
    jpg, _, arr = images
    out = nl.decode(jpg)
    assert out.shape == arr.shape
    assert np.mean(np.abs(out.astype(int) - arr.astype(int))) < 3.0


def test_resize_pad_matches_pil(images):
    _, png, arr = images
    mean = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
    target = 32
    out = np.zeros((target, target, 3), np.float32)
    scale = np.zeros(1, np.float32)
    pool = nl.NativePool(2)
    pool.submit_resize_pad(png, out, scale, mean, std)
    assert pool.wait() == 0
    pool.close()
    s = target / max(arr.shape[0], arr.shape[1])
    nw, nh = round(arr.shape[1] * s), round(arr.shape[0] * s)
    assert scale[0] == pytest.approx(s)
    # full parity with the PIL det path (bicubic + black-then-normalize pad)
    from clipself_tpu.data.transforms import det_transform

    ref = det_transform(Image.fromarray(arr), target)
    assert np.abs(out - ref).mean() < 0.02
    # padding equals normalized black, exactly as det_transform pads
    np.testing.assert_allclose(out[nh:], ref[nh:], atol=1e-5)


def test_distill_item(images):
    _, png, arr = images
    mean = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
    det = np.zeros((32, 32, 3), np.float32)
    crops = np.zeros((2, 16, 16, 3), np.float32)
    boxes = np.asarray([[0, 0, 45, 35], [10, 10, 90, 70]], np.float32)
    pool = nl.NativePool(2)
    pool.submit_distill_item(png, det, crops, boxes, mean, std)
    assert pool.wait() == 0
    pool.close()
    assert np.isfinite(det).all() and np.isfinite(crops).all()
    # parity with the python (PIL) pipeline: det_transform and crop_transform
    from clipself_tpu.data.transforms import crop_transform, det_transform

    ref_det = det_transform(Image.fromarray(arr), 32)
    assert np.abs(det - ref_det).mean() < 0.05
    ref_crop = crop_transform(Image.fromarray(arr).crop((0, 0, 45, 35)), 16)
    assert np.abs(crops[0] - ref_crop).mean() < 0.05


def test_pool_reports_errors(images):
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    out = np.zeros((16, 16, 3), np.float32)
    scale = np.zeros(1, np.float32)
    pool = nl.NativePool(1)
    pool.submit_resize_pad("/does/not/exist.jpg", out, scale, mean, std)
    assert pool.wait() == 1
    pool.close()


def test_throughput_parallel(images):
    jpg, _, _ = images
    import time

    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    n = 64
    outs = np.zeros((n, 64, 64, 3), np.float32)
    scales = np.zeros((n, 1), np.float32)
    pool = nl.NativePool(4)
    t0 = time.perf_counter()
    for i in range(n):
        pool.submit_resize_pad(jpg, outs[i], scales[i], mean, std)
    assert pool.wait() == 0
    dt = time.perf_counter() - t0
    pool.close()
    assert dt < 5.0  # sanity: 64 small images well under 5s


def test_native_distill_loader_matches_pil(tmp_path):
    """NativeDistillLoader batches match the PIL __getitem__ path."""
    import json

    from clipself_tpu.data.datasets import GridDistillDataset
    from clipself_tpu.data.loader import NativeDistillLoader

    rng = np.random.default_rng(7)
    imgs = []
    for i in range(4):
        arr = np.asarray(
            Image.fromarray(rng.uniform(0, 255, (6, 8, 3)).astype(np.uint8)).resize(
                (96, 72), Image.BILINEAR
            )
        )
        Image.fromarray(arr).save(tmp_path / f"i{i}.jpg", quality=97)
        imgs.append({"id": i, "file_name": f"i{i}.jpg", "width": 96, "height": 72})
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({"images": imgs, "annotations": [], "categories": []}))

    ds = GridDistillDataset(
        str(ann), str(tmp_path), det_size=64, crop_size=32, max_split=3, max_anns=4
    )
    loader = NativeDistillLoader(ds, batch_size=4, shuffle=False)
    batch = next(iter(loader))
    assert batch["images"].shape == (4, 64, 64, 3)
    assert batch["crops"].shape == (4, 4, 32, 32, 3)
    ds.set_epoch(0)  # the loader's prefetch may already have advanced it
    for j in range(4):
        ref = ds[j]
        np.testing.assert_allclose(batch["boxes"][j], ref["boxes"], atol=1e-5)
        assert np.abs(batch["images"][j] - ref["images"]).mean() < 0.06
        valid = ref["boxes"][:, 4] > 0
        assert np.abs(batch["crops"][j][valid] - ref["crops"][valid]).mean() < 0.08


def test_distill_item_fewer_boxes_than_rows(images):
    """Regression: K crop boxes with M > K output rows must only read K
    boxes (previously sized the read from the output buffer — OOB)."""
    _, png, arr = images
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    det = np.zeros((32, 32, 3), np.float32)
    crops = np.zeros((20, 16, 16, 3), np.float32)  # M=20 rows
    boxes = np.asarray([[0, 0, 45, 35]], np.float32)  # K=1 box
    pool = nl.NativePool(2)
    pool.submit_distill_item(png, det, crops, boxes, mean, std)
    assert pool.wait() == 0
    pool.close()
    assert np.isfinite(crops).all()
    assert np.abs(crops[0]).sum() > 0  # row 0 filled
    assert np.all(crops[1:] == 0)  # untouched rows stay zero
    # oversized K is a loud error, not an OOB write
    pool = nl.NativePool(1)
    with pytest.raises(ValueError):
        pool.submit_distill_item(
            png, det, np.zeros((1, 16, 16, 3), np.float32),
            np.zeros((2, 4), np.float32), mean, std,
        )
    pool.close()


def test_pool_wait_status_per_job(images):
    """Per-job success flags confine fallbacks to the failed rows."""
    _, png, _ = images
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    outs = np.zeros((3, 16, 16, 3), np.float32)
    scales = np.zeros((3, 1), np.float32)
    pool = nl.NativePool(2)
    pool.submit_resize_pad(png, outs[0], scales[0], mean, std)
    pool.submit_resize_pad("/does/not/exist.jpg", outs[1], scales[1], mean, std)
    pool.submit_resize_pad(png, outs[2], scales[2], mean, std)
    status = pool.wait_status(3)
    np.testing.assert_array_equal(status, [1, 0, 1])
    # counters reset between waits
    pool.submit_resize_pad(png, outs[0], scales[0], mean, std)
    np.testing.assert_array_equal(pool.wait_status(1), [1])
    pool.close()


def test_loader_follows_dataset_epoch(tmp_path):
    """The dataset's epoch (set by the trainer on resume) drives the shuffle
    order; the loader only self-advances when nobody else moved it."""
    import json

    from clipself_tpu.data.datasets import GridDistillDataset
    from clipself_tpu.data.loader import NativeDistillLoader

    rng = np.random.default_rng(1)
    imgs = []
    for i in range(6):
        arr = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"i{i}.png")
        imgs.append({"id": i, "file_name": f"i{i}.png", "width": 24, "height": 24})
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({"images": imgs, "annotations": [], "categories": []}))
    ds = GridDistillDataset(
        str(ann), str(tmp_path), det_size=32, crop_size=16, max_split=2, max_anns=2
    )

    loader = NativeDistillLoader(ds, batch_size=2, shuffle=True, seed=11)
    ds.set_epoch(3)  # simulate resume at epoch 3
    it = loader._indices()
    got = np.concatenate([next(it) for _ in range(3)])
    want = np.random.default_rng((11, 3)).permutation(6)
    np.testing.assert_array_equal(got, want)
    # trainer did not advance -> the loader self-advances the dataset
    next(it)
    assert ds.epoch == 4

    # smaller-than-batch dataset fails loudly instead of spinning forever
    with pytest.raises(ValueError):
        next(NativeDistillLoader(ds, batch_size=64)._indices())
