"""Geometry ops: IoU / box coder / NMS / assigner / sampler vs NumPy refs."""

import jax
import jax.numpy as jnp
import numpy as np

from clipself_tpu.detector.boxes import box_iou, clip_boxes, decode_boxes, encode_boxes
from clipself_tpu.detector.nms import NEG_INF, multiclass_nms, nms
from clipself_tpu.detector.targets import assign_max_iou, random_sample


def np_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-6)


def rand_boxes(rng, n, size=100.0):
    lo = rng.uniform(0, size * 0.8, (n, 2))
    wh = rng.uniform(1.0, size * 0.2, (n, 2))
    return np.concatenate([lo, lo + wh], -1).astype(np.float32)


def test_iou_matches_numpy():
    rng = np.random.default_rng(0)
    a, b = rand_boxes(rng, 13), rand_boxes(rng, 7)
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_iou(a, b), rtol=1e-5, atol=1e-6)


def test_box_coder_roundtrip():
    rng = np.random.default_rng(1)
    src, dst = rand_boxes(rng, 20), rand_boxes(rng, 20)
    stds = (0.1, 0.1, 0.2, 0.2)
    deltas = encode_boxes(jnp.asarray(src), jnp.asarray(dst), stds=stds)
    back = decode_boxes(jnp.asarray(src), deltas, stds=stds)
    np.testing.assert_allclose(np.asarray(back), dst, rtol=1e-4, atol=1e-3)


def test_clip_boxes():
    b = jnp.asarray([[-5.0, -5.0, 500.0, 30.0]])
    out = np.asarray(clip_boxes(b, (100, 200)))
    np.testing.assert_allclose(out, [[0.0, 0.0, 200.0, 30.0]])


def greedy_nms_np(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    sup = np.zeros(len(boxes), bool)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        iou = np_iou(boxes[i : i + 1], boxes)[0]
        sup |= iou > thr
        sup[i] = True
    return keep


def test_nms_matches_greedy():
    rng = np.random.default_rng(2)
    boxes = rand_boxes(rng, 64, size=50.0)
    scores = rng.uniform(size=64).astype(np.float32)
    ref = greedy_nms_np(boxes, scores, 0.5)
    _, s, idx = jax.jit(lambda b, s: nms(b, s, 0.5, 20))(
        jnp.asarray(boxes), jnp.asarray(scores)
    )
    got = [int(i) for i in np.asarray(idx) if i >= 0]
    assert got == ref[: len(got)]
    assert len(got) == min(20, len(ref))


def test_nms_respects_valid_mask():
    boxes = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    valid = jnp.asarray([False, True])
    _, s, idx = nms(boxes, scores, 0.5, 2, valid=valid)
    assert int(idx[0]) == 1 and int(idx[1]) == -1


def test_multiclass_nms():
    # same box, two classes: both survive (offset trick); low scores dropped
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
    scores = jnp.asarray([[0.9, 0.05], [0.005, 0.8], [0.6, 0.001]])
    b, s, l = multiclass_nms(boxes, scores, 0.01, 0.5, 4)
    got = {(round(float(x), 3), int(c)) for x, c in zip(s, l) if x > NEG_INF}
    assert got == {(0.9, 0), (0.8, 1), (0.6, 0)}


def test_assign_max_iou():
    anchors = jnp.asarray(
        [[0, 0, 10, 10], [0, 0, 9, 10], [50, 50, 60, 60], [200, 200, 210, 210]],
        jnp.float32,
    )
    gts = jnp.asarray([[0, 0, 10, 10], [52, 50, 60, 60], [0, 0, 0, 0]], jnp.float32)
    valid = jnp.asarray([True, True, False])
    a = assign_max_iou(anchors, gts, valid, 0.7, 0.3, 0.3, True)
    pos = np.asarray(a.pos)
    assert pos[0]  # exact-match anchor
    assert pos[1] == (float(a.max_iou[1]) >= 0.7)  # positive iff above thr
    assert pos[2]  # best anchor for gt 1 (IoU 0.8 >= min_pos_iou)
    assert not pos[3] and bool(a.neg[3])
    assert int(a.gt_idx[0]) == 0 and int(a.gt_idx[2]) == 1


def test_assign_ignores_invalid_gt():
    anchors = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    gts = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    a = assign_max_iou(anchors, gts, jnp.asarray([False]), 0.5, 0.3, 0.3, True)
    assert not bool(a.pos[0])


def test_random_sample_budget():
    rng = np.random.default_rng(3)
    n = 100
    pos = jnp.asarray(rng.uniform(size=n) < 0.1)
    neg = ~pos
    from clipself_tpu.detector.targets import Assignment

    a = Assignment(
        gt_idx=jnp.zeros(n, jnp.int32), max_iou=jnp.zeros(n), pos=pos, neg=neg
    )
    r = random_sample(jax.random.PRNGKey(0), a, 32, 0.5)
    assert int(r.pos_mask.sum()) == min(int(pos.sum()), 16)
    assert int(r.pos_mask.sum()) + int(r.neg_mask.sum()) == 32
    assert not bool(jnp.any(r.pos_mask & ~pos))
    assert not bool(jnp.any(r.neg_mask & ~neg))


def test_pallas_nms_matches_lax(monkeypatch):
    """Interpret-mode Pallas NMS == the lax greedy reference."""
    from clipself_tpu.ops.nms_pallas import nms_keep_mask

    rng = np.random.default_rng(7)
    boxes = rand_boxes(rng, 200, size=60.0)
    scores = rng.uniform(size=200).astype(np.float32)
    order = np.argsort(-scores)
    sorted_boxes = jnp.asarray(boxes[order])
    ref = greedy_nms_np(boxes, scores, 0.5)
    keep = np.asarray(
        nms_keep_mask(sorted_boxes, jnp.ones(200, bool), 0.5, interpret=True)
    )
    got = [int(order[i]) for i in np.where(keep)[0]]
    # same set of survivors (order within equal scores may differ)
    assert sorted(got) == sorted(ref)
    # padding/validity: invalid slots never kept
    keep2 = np.asarray(
        nms_keep_mask(
            sorted_boxes, jnp.asarray([True] * 100 + [False] * 100), 0.5,
            interpret=True,
        )
    )
    assert not keep2[100:].any()


def test_random_sample_exact_under_score_ties():
    """Tied sampling scores must not overshoot the caps: the old
    `score >= kth` threshold kept EVERY entry tied at the k-th value
    (advisor round-4 finding); the top-k scatter masks keep exactly
    min(count, cap) regardless of ties."""
    from clipself_tpu.detector.targets import Assignment, _topk_mask

    # direct: all-tied scores still yield exactly k entries
    mask = np.asarray(_topk_mask(jnp.zeros(50), 7))
    assert mask.sum() == 7
    # dynamic cutoff inside the static top-k
    mask = np.asarray(_topk_mask(jnp.zeros(50), 10, k_dynamic=jnp.asarray(4)))
    assert mask.sum() == 4

    # end-to-end: more positives than the cap — never exceeds it
    n = 64
    pos = jnp.ones(n, bool)
    a = Assignment(
        gt_idx=jnp.zeros(n, jnp.int32), max_iou=jnp.zeros(n), pos=pos, neg=~pos
    )
    r = random_sample(jax.random.PRNGKey(1), a, 32, 0.5)
    assert int(r.pos_mask.sum()) == 16
    assert int(r.neg_mask.sum()) == 0
