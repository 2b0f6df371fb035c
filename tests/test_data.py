"""Data pipeline tests on synthetic COCO fixtures."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from clipself_tpu.core.constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD
from clipself_tpu.data.coco import COCOIndex, mask2box, rgb2id
from clipself_tpu.data.datasets import (
    COCOPanopticEvalDataset,
    GridDistillDataset,
    ProposalDistillDataset,
    RegionCLIPDataset,
)
from clipself_tpu.data.loader import make_loader
from clipself_tpu.data.transforms import det_transform, get_scale


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    from tests.conftest import write_micro_coco

    root = tmp_path_factory.mktemp("coco")
    write_micro_coco(root, n_images=4, anns_per_image=2, embed_dim=16)
    return root


def test_rgb2id_and_mask2box():
    c = np.asarray([[[1, 2, 3]]], np.uint8)
    assert rgb2id(c)[0, 0] == 1 + 2 * 256 + 3 * 65536
    m = np.zeros((6, 8), bool)
    m[2:4, 3:6] = True
    assert mask2box(m) == (3.0, 2.0, 6.0, 4.0)
    assert mask2box(np.zeros((4, 4), bool)) is None


def test_det_transform_padding(coco_dir):
    img = Image.open(coco_dir / "images" / "img0.jpg")  # 80x60
    out = det_transform(img, 64)
    assert out.shape == (64, 64, 3)
    # bottom padding rows: normalized zero pixel = (0 - mean)/std
    pad_val = (0.0 - np.asarray(OPENAI_DATASET_MEAN)) / np.asarray(OPENAI_DATASET_STD)
    np.testing.assert_allclose(out[63, 0], pad_val, rtol=1e-5)
    assert get_scale((80, 60), 64) == 64 / 80


def test_grid_distill_dataset(coco_dir):
    ds = GridDistillDataset(
        str(coco_dir / "instances.json"),
        str(coco_dir / "images"),
        det_size=64,
        crop_size=32,
        max_anns=6,
        max_split=4,
    )
    item = ds[0]
    assert item["images"].shape == (64, 64, 3)
    assert item["boxes"].shape == (6, 5)
    assert item["crops"].shape == (6, 32, 32, 3)
    valid = item["boxes"][:, 4] > 0.5
    assert valid.sum() >= 1
    b = item["boxes"][valid]
    assert (b[:, :4] >= 0).all() and (b[:, :4] <= 1).all()
    # boxes are normalized against the padded square: for an 80x60 image the
    # used area is x<=1, y<=60/80 * ... = scaled by 64/80 then /64
    assert b[:, 3].max() <= 60 * (64 / 80) / 64 + 1e-6

    # determinism given (seed, epoch, idx)
    item2 = ds[0]
    np.testing.assert_array_equal(item["boxes"], item2["boxes"])
    ds.set_epoch(1)
    item3 = ds[0]
    assert not np.array_equal(item["boxes"], item3["boxes"])


def test_proposal_distill_dataset(coco_dir):
    ds = ProposalDistillDataset(
        str(coco_dir / "instances.json"),
        str(coco_dir / "images"),
        det_size=64,
        crop_size=32,
        max_anns=4,
        min_size=2,
        max_size=64,
    )
    item = ds[1]
    assert item["boxes"].shape == (4, 5)
    assert (item["boxes"][:, 4] > 0.5).sum() == 2  # both anns valid


def test_region_clip_dataset(coco_dir):
    ds = RegionCLIPDataset(
        str(coco_dir / "instances.json"), str(coco_dir / "images"), det_size=64, max_anns=4
    )
    item = ds[0]
    assert item["boxes"].shape == (4, 6)
    valid = item["boxes"][:, 5] > 0.5
    labels = item["boxes"][valid, 4]
    assert set(labels.tolist()) <= {0.0, 1.0}


def test_panoptic_eval_dataset(coco_dir):
    ds = COCOPanopticEvalDataset(
        str(coco_dir / "panoptic.json"),
        str(coco_dir / "images"),
        str(coco_dir / "segm"),
        embed_path=str(coco_dir / "emb.npy"),
        det_size=64,
        crop_size=32,
        downsample_factor=8,
        min_size=2,
        max_size=256,
    )
    assert ds.embeddings.shape == (2, 16)
    item = ds[0]
    assert item["boxes"].shape[1] == 8
    assert item["gt_masks"].shape == (ds.max_anns, 8, 8)
    valid = item["boxes"][:, 5] > 0.5
    assert valid.sum() == 2
    isthing = item["boxes"][valid, 7]
    assert set(isthing.tolist()) == {0.0, 1.0}
    # masks nonempty for valid entries
    assert item["gt_masks"][0].sum() > 0
    # masked crop differs from plain crop
    assert not np.allclose(item["crops"][0], item["masked_crops"][0])


def test_grain_loader(coco_dir):
    ds = GridDistillDataset(
        str(coco_dir / "instances.json"),
        str(coco_dir / "images"),
        det_size=64,
        crop_size=32,
        max_anns=4,
        max_split=3,
    )
    loader = make_loader(ds, batch_size=2, shuffle=True, seed=0, num_epochs=1)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["images"].shape == (2, 64, 64, 3)
    assert batches[0]["boxes"].shape == (2, 4, 5)

    # sharded loading: two shards see disjoint halves
    l0 = make_loader(ds, batch_size=2, shuffle=False, num_epochs=1, shard_index=0, shard_count=2)
    l1 = make_loader(ds, batch_size=2, shuffle=False, num_epochs=1, shard_index=1, shard_count=2)
    b0, b1 = next(iter(l0)), next(iter(l1))
    assert not np.allclose(b0["images"], b1["images"])
