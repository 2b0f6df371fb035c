"""Test harness: run everything on a simulated 8-device CPU mesh.

Mirrors the multi-device test strategy the reference lacks (SURVEY.md §4):
`xla_force_host_platform_device_count=8` gives a TPU-mesh simulation without
hardware. The axon TPU plugin overrides the JAX_PLATFORMS env var, so we must
force the platform through jax.config before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def write_micro_coco(root, n_images=4, image_size=None, anns_per_image=2,
                     embed_dim=16):
    """Write a tiny on-disk COCO-format corpus: train instances JSON +
    images, panoptic val JSON + segment PNGs, and a classifier embedding
    matrix. Shared by the data-pipeline and CLI end-to-end suites.

    image_size: None -> per-image varying sizes (80+10i, 60+5i); (w, h)
    for a fixed size. Returns (img_dir, seg_dir).
    """
    import json

    import numpy as np
    from PIL import Image

    img_dir = root / "images"
    seg_dir = root / "segm"
    img_dir.mkdir(exist_ok=True)
    seg_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    images, annotations, pan_annotations = [], [], []
    for i in range(n_images):
        w, h = image_size if image_size else (80 + 10 * i, 60 + 5 * i)
        name = f"img{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        ).save(img_dir / name)
        images.append({"id": i, "file_name": name, "width": w, "height": h})
        for j in range(anns_per_image):
            annotations.append(
                {
                    "id": i * 10 + j,
                    "image_id": i,
                    "category_id": (j % 2) + 1,
                    "bbox": [5 + j * 10, 5, 20, 15],
                    "area": 300,
                }
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
                    {"id": 1, "category_id": 1, "bbox": [0, 0, w, h // 2],
                     "area": w * h // 2},
                    {"id": 2, "category_id": 2, "bbox": [0, h // 2, w, h - h // 2],
                     "area": w * h // 2},
                ],
            }
        )
    cats = [
        {"id": 1, "name": "thing_a", "isthing": 1},
        {"id": 2, "name": "stuff_b", "isthing": 0},
    ]
    with open(root / "instances.json", "w") as f:
        json.dump({"images": images, "annotations": annotations, "categories": cats}, f)
    with open(root / "panoptic.json", "w") as f:
        json.dump({"images": images, "annotations": pan_annotations, "categories": cats}, f)
    emb = rng.normal(size=(2, embed_dim)).astype(np.float32)
    np.save(root / "emb.npy", emb)
    return img_dir, seg_dir
