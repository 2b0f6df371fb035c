"""End-to-end jitted train step on the simulated 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipself_tpu.core.config import get_model_config
from clipself_tpu.models.factory import create_model
from clipself_tpu.parallel.mesh import create_mesh, shard_batch
from clipself_tpu.train.ensemble import student_teacher_ensemble
from clipself_tpu.train.methods import clipself_loss, regionclip_loss, _fed_class_mask
from clipself_tpu.train.optim import build_optimizer, make_schedule, trainable_labels
from clipself_tpu.train.step import TrainState, make_train_step

CFG = get_model_config("EVA02-CLIP-Tiny-Test")


def _batch(rng, b=8, m=4, s=32, crop=32):
    images = rng.normal(size=(b, s, s, 3)).astype(np.float32)
    xy = rng.uniform(0, 0.5, size=(b, m, 2)).astype(np.float32)
    wh = rng.uniform(0.1, 0.5, size=(b, m, 2)).astype(np.float32)
    valid = (rng.uniform(size=(b, m, 1)) > 0.3).astype(np.float32)
    valid[:, 0] = 1.0  # at least one valid box per image
    boxes = np.concatenate([xy, xy + wh, valid], axis=-1)
    crops = rng.normal(size=(b, m, crop, crop, 3)).astype(np.float32)
    return {
        "images": jnp.asarray(images),
        "boxes": jnp.asarray(boxes),
        "crops": jnp.asarray(crops),
    }


@pytest.fixture(scope="module")
def setup():
    model, params = create_model(CFG, dtype=jnp.float32, seed=0)
    teacher = jax.tree.map(lambda x: x.copy(), params)
    return model, params, teacher


def test_clipself_step_multichip(setup):
    model, params, teacher = setup
    assert jax.device_count() == 8
    mesh = create_mesh()
    sched = make_schedule("cosine", 1e-3, warmup=2, total_steps=20)
    tx = build_optimizer(
        params, sched, wd=0.1, unlocked_groups=CFG.vision.layers,
        num_layers=CFG.vision.layers,
    )
    step = make_train_step(model, tx, clipself_loss, mesh=mesh)
    # snapshot originals; state gets fresh copies because the step donates its input
    params0 = jax.tree.map(np.asarray, params)
    state = TrainState.create(jax.tree.map(jnp.array, params), tx)
    rng = jax.random.PRNGKey(0)
    batch = shard_batch(mesh, _batch(np.random.default_rng(0)))

    losses = []
    for _ in range(4):
        state, metrics = step(state, teacher, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # on a repeated batch the distill loss must decrease
    assert losses[-1] < losses[0]
    assert int(state.step) == 4

    # frozen leaves unchanged: text tower and embedding-level vision params
    np.testing.assert_array_equal(
        np.asarray(state.params["text"]["text_projection"]),
        params0["text"]["text_projection"],
    )
    np.testing.assert_array_equal(
        np.asarray(state.params["visual"]["pos_embed"]),
        params0["visual"]["pos_embed"],
    )
    # unlocked blocks must have moved
    a = np.asarray(state.params["visual"]["blocks_1"]["mlp"]["w3"]["kernel"])
    b = params0["visual"]["blocks_1"]["mlp"]["w3"]["kernel"]
    assert np.abs(a - b).max() > 0

    # logit_scale clamped to [0, ln(100)]
    ls = float(state.params["logit_scale"])
    assert 0.0 <= ls <= np.log(100.0) + 1e-6


def test_lock_groups(setup):
    model, params, _ = setup
    labels = trainable_labels(params, unlocked_groups=1, num_layers=CFG.vision.layers)
    assert labels["visual"]["blocks_1"]["mlp"]["w3"]["kernel"] == "train"
    assert labels["visual"]["blocks_0"]["mlp"]["w3"]["kernel"] == "freeze"
    assert labels["text"]["text_projection"] == "freeze"
    assert labels["visual"]["pos_embed"] == "freeze"
    assert labels["logit_scale"] == "freeze"


def test_regionclip_loss(setup):
    model, params, teacher = setup
    rng_np = np.random.default_rng(1)
    b, m, c = 4, 4, 32
    batch = _batch(rng_np, b=b, m=m)
    labels = rng_np.integers(0, c, size=(b, m, 1)).astype(np.float32)
    valid = np.asarray(batch["boxes"][..., 4:5])
    boxes6 = np.concatenate([np.asarray(batch["boxes"][..., :4]), labels, valid], -1)
    batch = {"images": batch["images"], "boxes": jnp.asarray(boxes6)}
    nouns = rng_np.normal(size=(c, CFG.embed_dim)).astype(np.float32)
    nouns /= np.linalg.norm(nouns, axis=-1, keepdims=True)

    loss, metrics = regionclip_loss(
        params, teacher, batch, model, jax.random.PRNGKey(0),
        noun_embeddings=jnp.asarray(nouns), num_sample_cats=10,
    )
    assert np.isfinite(float(loss))
    assert float(loss) > 0


def test_fed_class_mask():
    labels = jnp.asarray([3, 3, 7, 0])
    valid = jnp.asarray([1.0, 1.0, 1.0, 0.0])  # label 0 is padding
    mask = _fed_class_mask(labels, valid, num_classes=50, num_sample=10, rng=jax.random.PRNGKey(0))
    mask = np.asarray(mask)
    assert mask[3] and mask[7]
    assert mask.sum() == 10  # appeared (2) + sampled absents = num_sample
    # if more appear than num_sample, all appeared kept
    labels2 = jnp.arange(20)
    valid2 = jnp.ones(20)
    mask2 = np.asarray(
        _fed_class_mask(labels2, valid2, num_classes=50, num_sample=10, rng=jax.random.PRNGKey(1))
    )
    assert mask2[:20].all()


def test_ensemble():
    s = {"a": jnp.ones(3)}
    t = {"a": jnp.zeros(3)}
    e = student_teacher_ensemble(s, t, 0.7)
    np.testing.assert_allclose(np.asarray(e["a"]), 0.7)


def test_schedule_matches_reference_formula():
    sched = make_schedule("cosine", base_lr=1.0, warmup=10, total_steps=110)
    # warmup: base * (step + 1) / warmup
    np.testing.assert_allclose(float(sched(0)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(9)), 1.0, rtol=1e-6)
    # cosine: 0.5 * (1 + cos(pi * e / es)) * base
    e, es = 50 - 10, 100
    np.testing.assert_allclose(
        float(sched(50)), 0.5 * (1 + np.cos(np.pi * e / es)), rtol=1e-6
    )


def test_fsdp_step_matches_data_parallel(setup):
    """ZeRO-3 sharding over a ('data','fsdp') mesh is a layout change only:
    two steps on the hybrid mesh must reproduce the pure-DP trajectory."""
    from clipself_tpu.parallel.mesh import fsdp_shardings

    model, params, teacher = setup
    sched = make_schedule("cosine", 1e-3, warmup=2, total_steps=20)

    def run(mesh, use_fsdp):
        tx = build_optimizer(
            params, sched, wd=0.1, unlocked_groups=CFG.vision.layers,
            num_layers=CFG.vision.layers,
        )
        state = TrainState.create(jax.tree.map(jnp.array, params), tx)
        tch = jax.tree.map(jnp.array, teacher)
        state_sh = teacher_sh = None
        if use_fsdp:
            state_sh = fsdp_shardings(mesh, state, min_size=128)
            teacher_sh = fsdp_shardings(mesh, tch, min_size=128)
            # something must actually be sharded for this test to mean anything
            specs = {s.spec for s in jax.tree.leaves(state_sh)}
            assert any(s != jax.sharding.PartitionSpec() for s in specs)
            state = jax.tree.map(jax.device_put, state, state_sh)
            tch = jax.tree.map(jax.device_put, tch, teacher_sh)
        step = make_train_step(
            model, tx, clipself_loss, mesh=mesh,
            state_sharding=state_sh, teacher_sharding=teacher_sh,
        )
        batch = shard_batch(mesh, _batch(np.random.default_rng(0)))
        rng = jax.random.PRNGKey(0)
        out = []
        for _ in range(2):
            state, metrics = step(state, tch, batch, rng)
            out.append(float(metrics["loss"]))
        return out, jax.tree.map(np.asarray, state.params)

    dp_losses, dp_params = run(create_mesh(), use_fsdp=False)
    fs_mesh = create_mesh(8, axis_names=("data", "fsdp"), shape=(4, 2))
    fs_losses, fs_params = run(fs_mesh, use_fsdp=True)

    np.testing.assert_allclose(fs_losses, dp_losses, rtol=1e-5)
    a = dp_params["visual"]["blocks_1"]["mlp"]["w3"]["kernel"]
    b = fs_params["visual"]["blocks_1"]["mlp"]["w3"]["kernel"]
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_tensor_parallel_step_matches_data_parallel(setup):
    """Megatron-style TP over a ('data','model') mesh is a layout change
    only: the sharded-weights trajectory must reproduce pure DP."""
    from clipself_tpu.parallel.mesh import tp_shardings

    model, params, teacher = setup
    sched = make_schedule("cosine", 1e-3, warmup=2, total_steps=20)

    def run(mesh, use_tp):
        tx = build_optimizer(
            params, sched, wd=0.1, unlocked_groups=CFG.vision.layers,
            num_layers=CFG.vision.layers,
        )
        state = TrainState.create(jax.tree.map(jnp.array, params), tx)
        tch = jax.tree.map(jnp.array, teacher)
        state_sh = teacher_sh = None
        if use_tp:
            state_sh = tp_shardings(mesh, state)
            teacher_sh = tp_shardings(mesh, tch)
            specs = {s.spec for s in jax.tree.leaves(state_sh)}
            assert any(s != jax.sharding.PartitionSpec() for s in specs)
            state = jax.tree.map(jax.device_put, state, state_sh)
            tch = jax.tree.map(jax.device_put, tch, teacher_sh)
        step = make_train_step(
            model, tx, clipself_loss, mesh=mesh,
            state_sharding=state_sh, teacher_sharding=teacher_sh,
        )
        batch = shard_batch(mesh, _batch(np.random.default_rng(0)))
        rng = jax.random.PRNGKey(0)
        out = []
        for _ in range(2):
            state, metrics = step(state, tch, batch, rng)
            out.append(float(metrics["loss"]))
        return out, jax.tree.map(np.asarray, state.params)

    dp_losses, dp_params = run(create_mesh(), use_tp=False)
    tp_mesh = create_mesh(8, axis_names=("data", "model"), shape=(4, 2))
    tp_losses, tp_params = run(tp_mesh, use_tp=True)

    np.testing.assert_allclose(tp_losses, dp_losses, rtol=1e-5)
    a = dp_params["visual"]["blocks_1"]["mlp"]["w3"]["kernel"]
    b = tp_params["visual"]["blocks_1"]["mlp"]["w3"]["kernel"]
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_hybrid_dp_fsdp_tp_step_matches_data_parallel(setup):
    """All three axes at once — ('data','fsdp','model') = (2,2,2) — must
    still be a pure layout change."""
    from clipself_tpu.parallel.mesh import hybrid_shardings

    model, params, teacher = setup
    sched = make_schedule("cosine", 1e-3, warmup=2, total_steps=20)

    def run(mesh, shard):
        tx = build_optimizer(
            params, sched, wd=0.1, unlocked_groups=CFG.vision.layers,
            num_layers=CFG.vision.layers,
        )
        state = TrainState.create(jax.tree.map(jnp.array, params), tx)
        tch = jax.tree.map(jnp.array, teacher)
        state_sh = teacher_sh = None
        if shard:
            state_sh = hybrid_shardings(mesh, state, min_size=128)
            teacher_sh = hybrid_shardings(mesh, tch, min_size=128)
            state = jax.tree.map(jax.device_put, state, state_sh)
            tch = jax.tree.map(jax.device_put, tch, teacher_sh)
        step = make_train_step(
            model, tx, clipself_loss, mesh=mesh,
            state_sharding=state_sh, teacher_sharding=teacher_sh,
        )
        batch = shard_batch(mesh, _batch(np.random.default_rng(0)))
        state, metrics = step(state, tch, batch, jax.random.PRNGKey(0))
        return float(metrics["loss"])

    dp = run(create_mesh(), shard=False)
    hy_mesh = create_mesh(8, axis_names=("data", "fsdp", "model"), shape=(2, 2, 2))
    hy = run(hy_mesh, shard=True)
    np.testing.assert_allclose(hy, dp, rtol=1e-5)


def test_trainable_labels_openclip_and_resnet():
    """Lock semantics must cover every tower family (reference
    transformer.py:391-409, modified_resnet.py:255-278), not just EVA —
    a silent all-freeze regression here trains nothing."""
    from clipself_tpu.core.config import get_model_config
    from clipself_tpu.models.factory import create_model

    # OpenCLIP ViT: resblocks_{i} indexed like EVA blocks
    vcfg = get_model_config("ViT-Tiny-Test")
    _, vp = create_model(vcfg, dtype=jnp.float32)
    labels = trainable_labels(vp, unlocked_groups=1, num_layers=vcfg.vision.layers)
    flat = {"/".join(str(getattr(k, "key", k)) for k in p): v
            for p, v in jax.tree_util.tree_leaves_with_path(labels)}
    last = vcfg.vision.layers - 1
    assert any(v == "train" for k, v in flat.items() if f"resblocks_{last}" in k)
    assert all(v == "freeze" for k, v in flat.items() if "resblocks_0" in k and last != 0)
    assert any(v == "train" for v in flat.values()), "must not freeze everything"

    # ResNet: stages from the end; attnpool always trainable
    rcfg = get_model_config("RN-Tiny-Test")
    _, rp = create_model(rcfg, dtype=jnp.float32)
    labels = trainable_labels(rp, unlocked_groups=1, num_layers=4)
    flat = {"/".join(str(getattr(k, "key", k)) for k in p): v
            for p, v in jax.tree_util.tree_leaves_with_path(labels)}
    assert all(v == "train" for k, v in flat.items() if "attnpool" in k)
    assert any(v == "train" for k, v in flat.items() if "layer4_" in k)
    assert all(v == "freeze" for k, v in flat.items() if "layer1_" in k)
    assert all(v == "freeze" for k, v in flat.items()
               if k.startswith("visual/bn1") or k.startswith("visual/conv1"))


def test_resnet_torch_roundtrip():
    """ModifiedResNet params survive export -> import through the torch
    layout (previously unmapped: checkpoints silently kept random init)."""
    from clipself_tpu.core.config import get_model_config
    from clipself_tpu.models.factory import create_model
    from clipself_tpu.models.torch_io import export_state_dict, import_state_dict

    cfg = get_model_config("RN-Tiny-Test")
    model, params = create_model(cfg, dtype=jnp.float32, seed=0)
    sd = export_state_dict(params, cfg)
    assert "visual.layer1.0.conv1.weight" in sd
    assert "visual.attnpool.q_proj.weight" in sd
    assert "visual.bn1.running_mean" in sd
    _, params2 = create_model(cfg, dtype=jnp.float32, seed=1)
    restored = import_state_dict(sd, params2, cfg, strict=True)
    a = np.asarray(restored["visual"]["layer1_0"]["conv2"]["kernel"])
    b = np.asarray(params["visual"]["layer1_0"]["conv2"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-6)
    c = np.asarray(restored["visual"]["attnpool"]["c_proj"]["kernel"])
    d = np.asarray(params["visual"]["attnpool"]["c_proj"]["kernel"])
    np.testing.assert_allclose(c, d, atol=1e-6)


def test_trainable_mask_skips_frozen_backward(setup):
    """Passing `trainable` labels to make_train_step must not change the
    resulting parameters (the optimizer already zeroes frozen updates) while
    making frozen-leaf gradients literally zero — the torch reference never
    computes them at all (requires_grad=False under lock(),
    eva_vit_model.py:500-516), so grad_norm must count only trainable grads."""
    model, params, teacher = setup
    sched = make_schedule("const", 1e-3, warmup=0, total_steps=20)
    batch = _batch(np.random.default_rng(3))
    rng = jax.random.PRNGKey(1)
    results = {}
    for use_mask in (False, True):
        tx = build_optimizer(
            params, sched, wd=0.1, unlocked_groups=1,
            num_layers=CFG.vision.layers,
        )
        labels = trainable_labels(
            params, unlocked_groups=1, num_layers=CFG.vision.layers
        ) if use_mask else None
        step = make_train_step(
            model, tx, clipself_loss, mesh=None, donate=False,
            trainable=labels, log_grad_norm=True,
        )
        state = TrainState.create(jax.tree.map(jnp.array, params), tx)
        state, metrics = step(state, teacher, batch, rng)
        results[use_mask] = (
            jax.tree.map(np.asarray, state.params),
            float(metrics["loss"]),
            float(metrics["grad_norm"]),
        )
    p0, loss0, gn0 = results[False]
    p1, loss1, gn1 = results[True]
    assert loss0 == loss1
    # same updates leaf by leaf: frozen leaves bit-identical (the optimizer
    # zeroed them in both runs); trainable leaves within 5% of the 1e-3 Adam
    # step — the two programs fuse the shared backward differently, and
    # near-zero grads amplify that noise through g/(sqrt(v)+eps), while a
    # masking bug would show full 1e-3-scale diffs (or zero frozen grads
    # where real ones belong)
    labels = trainable_labels(
        params, unlocked_groups=1, num_layers=CFG.vision.layers
    )
    def check(a, b, l):
        if l == "freeze":
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=0, atol=5e-5)
    jax.tree.map(check, p0, p1, labels)
    # frozen grads were real (nonzero) without the mask, so the norms differ
    assert gn1 < gn0


def test_accum_freq_matches_full_batch(setup):
    """--accum-freq equivalence: accum=2 over two half batches must produce
    the same parameters as accum=1 over the full batch (the reference exposes
    the flag but hard-disables it, `src/training/train.py:89`; first-class
    here via optax.MultiSteps — this pins that it actually works).

    clipself_loss is a masked mean over valid boxes, so grad-averaging the
    halves equals the full-batch gradient exactly when both halves carry the
    same valid count; the batch is built all-valid to make the test exact."""
    model, params, teacher = setup
    sched = make_schedule("cosine", 1e-3, warmup=2, total_steps=20)

    rng = np.random.default_rng(3)
    batches = []
    for _ in range(2):
        b = _batch(rng, b=8)
        # all boxes valid -> both halves have identical valid counts
        boxes = np.array(b["boxes"])
        boxes[..., 4] = 1.0
        b["boxes"] = jnp.asarray(boxes)
        batches.append(b)

    def run(accum: int):
        tx = build_optimizer(
            params, sched, wd=0.1, unlocked_groups=CFG.vision.layers,
            num_layers=CFG.vision.layers, accum_steps=accum,
        )
        step = make_train_step(model, tx, clipself_loss, mesh=None)
        state = TrainState.create(jax.tree.map(jnp.array, params), tx)
        key = jax.random.PRNGKey(0)
        for full in batches:
            if accum == 1:
                state, _ = step(state, teacher, full, key)
            else:
                for half in (slice(0, 4), slice(4, 8)):
                    sub = {k: v[half] for k, v in full.items()}
                    state, _ = step(state, teacher, sub, key)
        return jax.tree.map(np.asarray, state.params)

    p1 = run(1)
    p2 = run(2)
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat2 = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(p2)}
    for k, v in flat1:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(v, flat2[ks], rtol=2e-4, atol=2e-6, err_msg=ks)
    # sanity: training actually moved unlocked params in both runs
    a = p1["visual"]["blocks_1"]["mlp"]["w3"]["kernel"]
    b0 = np.asarray(params["visual"]["blocks_1"]["mlp"]["w3"]["kernel"])
    assert np.abs(a - b0).max() > 0
