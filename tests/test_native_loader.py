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
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    target = 32
    out = np.zeros((target, target, 3), np.float32)
    scale = np.zeros(1, np.float32)
    pool = nl.NativePool(2)
    pool.submit_resize_pad(png, out, scale, mean, std)
    assert pool.wait() == 0
    pool.close()
    s = target / max(arr.shape[0], arr.shape[1])
    nw, nh = round(arr.shape[1] * s), round(arr.shape[0] * s)
    ref = np.asarray(
        Image.fromarray(arr).resize((nw, nh), Image.BILINEAR), np.float32
    ) / 255.0
    assert scale[0] == pytest.approx(s)
    got = out[:nh, :nw]
    assert np.abs(got - ref).mean() < 0.02
    # padding is zero
    assert np.all(out[nh:] == 0) and np.all(out[:, nw:] == 0)


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
    # crop 0 reference via PIL
    ref = np.asarray(
        Image.fromarray(arr).crop((0, 0, 45, 35)).resize((16, 16), Image.BILINEAR),
        np.float32,
    ) / 255.0
    ref = (ref - mean) / std
    assert np.abs(crops[0] - ref).mean() < 0.1


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
