"""Model-zoo breadth: pretrained registry, OpenAI loader, HF towers, CoCa."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipself_tpu.core.config import get_model_config
from clipself_tpu.models.pretrained import (
    get_pretrained_cfg,
    list_pretrained,
    list_pretrained_tags_by_model,
    resolve_pretrained,
)


def test_pretrained_registry():
    assert ("EVA02-CLIP-B-16", "eva") in list_pretrained()
    assert "openai" in list_pretrained_tags_by_model("ViT-B-16")
    cfg = get_pretrained_cfg("EVA02-CLIP-B-16", "EVA")  # case-insensitive tag
    assert cfg["hf_hub"] == "QuanSun/EVA-CLIP"
    with pytest.raises(FileNotFoundError):
        resolve_pretrained("ViT-B-16", "not-a-tag-or-path")


def test_resolve_local_path(tmp_path):
    p = tmp_path / "ckpt.pt"
    p.write_bytes(b"x")
    assert resolve_pretrained("anything", str(p)) == str(p)


def test_openai_config_inference_and_remap():
    import torch

    from clipself_tpu.models.openai import (
        config_from_openai_state_dict,
        load_openai_state_dict,
        remap_openai_keys,
    )
    from clipself_tpu.models.factory import create_model
    from clipself_tpu.models.torch_io import export_state_dict

    # build an OpenCLIP-ViT state dict via our own exporter, then strip the
    # 'text.' prefix to emulate the OpenAI layout
    cfg = get_model_config("ViT-Tiny-Test")
    model, params = create_model(cfg, dtype=jnp.float32)
    sd = export_state_dict(params, cfg)
    openai_sd = {}
    for k, v in sd.items():
        openai_sd[k[5:] if k.startswith("text.") else k] = v
    inferred = config_from_openai_state_dict(openai_sd)
    assert inferred.embed_dim == cfg.embed_dim
    assert inferred.vision.layers == cfg.vision.layers
    assert inferred.vision.width == cfg.vision.width
    assert inferred.vision.patch_size == cfg.vision.patch_size
    assert inferred.text.layers == cfg.text.layers
    assert inferred.text.vocab_size == cfg.text.vocab_size
    remapped = remap_openai_keys(openai_sd)
    assert set(remapped) == set(sd)

    # full round trip through a (plain torch, non-jit) checkpoint file
    import tempfile, os

    from clipself_tpu.models.openai import load_openai_model

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "openai.pt")
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in openai_sd.items()}, path)
        m2, p2 = load_openai_model(path, dtype=jnp.float32)
        a = np.asarray(params["visual"]["proj"])
        b = np.asarray(p2["visual"]["proj"])
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_hf_text_tower():
    from clipself_tpu.models.hf_text import HFTextTower

    tower = HFTextTower(
        "bert", output_dim=16, pooler_type="mean_pooler",
        hf_config_kwargs=dict(
            hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=64, vocab_size=100, max_position_embeddings=32,
        ),
    )
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 100, (2, 8)), jnp.int32)
    params = tower.init(jax.random.PRNGKey(0), ids)["params"]
    out = jax.jit(lambda p, x: tower.apply({"params": p}, x))(params, ids)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_trunk_adapter_dense_protocol():
    import json as _json

    from clipself_tpu.core.config import VisionConfig
    from clipself_tpu.models.trunk_adapter import FlaxTrunkAdapter

    adapter = FlaxTrunkAdapter(
        VisionConfig(
            image_size=32, hf_trunk_name="vit",
            hf_trunk_kwargs=_json.dumps(dict(
                hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                intermediate_size=64, image_size=32, patch_size=8,
                num_channels=3,
            )),
        ),
        embed_dim=16,
    )
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    params = adapter.init(jax.random.PRNGKey(0), img)["params"]
    emb = adapter.apply({"params": params}, img)
    assert emb.shape == (2, 16)
    dense = adapter.apply({"params": params}, img, method="encode_dense")
    assert dense.shape == (2, 4, 4, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(dense), axis=-1), 1.0, atol=1e-3
    )
    boxes = jnp.asarray([[[0.1, 0.1, 0.9, 0.9]]] * 2)
    rois = adapter.apply({"params": params}, img, boxes, method="extract_roi_features")
    assert rois.shape == (2, 1, 16)
    masks = jnp.ones((2, 1, 4, 4))
    mp = adapter.apply({"params": params}, img, masks, method="mask_pool")
    assert mp.shape == (2, 1, 16)


@pytest.fixture(scope="module")
def coca_setup():
    import dataclasses

    from clipself_tpu.core.config import MultimodalConfig
    from clipself_tpu.models.coca import CoCa

    base = get_model_config("EVA02-CLIP-Tiny-Test")
    cfg = dataclasses.replace(
        base,
        text=dataclasses.replace(base.text, embed_cls=True, context_length=16),
        multimodal=MultimodalConfig(
            context_length=16, vocab_size=base.text.vocab_size,
            width=base.text.width, heads=2, layers=2,
        ),
    )
    model = CoCa(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    txt = jnp.asarray(rng.integers(1, cfg.text.vocab_size, (2, 16)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img, txt)["params"]
    return model, params, img, txt, cfg


def test_coca_forward_and_loss(coca_setup):
    from clipself_tpu.models.coca import coca_loss

    model, params, img, txt, cfg = coca_setup
    out = jax.jit(lambda p: model.apply({"params": p}, img, txt))(params)
    assert out["image_features"].shape == (2, cfg.embed_dim)
    assert out["text_features"].shape == (2, cfg.embed_dim)
    # embed_cls truncates one slot for the CLS token (reference
    # `coca_model.py:137`), so the caption stream is context-1 long
    assert out["logits"].shape == (2, 15, cfg.text.vocab_size)
    loss, metrics = coca_loss(out, txt)
    assert np.isfinite(float(loss))
    assert float(metrics["caption_loss"]) > 0


def test_coca_generate(coca_setup):
    from clipself_tpu.models.coca import generate

    model, params, img, _, cfg = coca_setup
    tokens = generate(model, params, img, sot_id=1, eot_id=2, max_len=8)
    tokens = np.asarray(tokens)
    assert tokens.shape == (2, 8)
    assert (tokens[:, 0] == 1).all()
    # sampling path
    tokens2 = generate(
        model, params, img, sot_id=1, eot_id=2, max_len=8, top_k=5,
        rng=jax.random.PRNGKey(3),
    )
    assert tokens2.shape == (2, 8)


def test_clip_with_hf_text_tower_and_tokenizer_routing():
    """CLIP assembly with an HF text tower (reference roberta-ViT-B-32
    config shape, factory.py:77-87 tokenizer routing)."""
    import dataclasses

    from clipself_tpu.core.config import CLIPConfig, TextConfig, VisionConfig
    from clipself_tpu.models.factory import create_model, get_tokenizer
    from clipself_tpu.tokenizer import tokenize

    cfg = CLIPConfig(
        embed_dim=16,
        vision=VisionConfig(image_size=32, patch_size=8, layers=1, width=32, head_width=16),
        text=TextConfig(
            hf_model_name="bert",
            hf_model_config=dict(
                hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                intermediate_size=64, vocab_size=100, max_position_embeddings=80,
            ),
            proj="mlp",
        ),
        name="hf-test",
    )
    model, params = create_model(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, 100, (2, 77)), jnp.int32)
    iemb, temb, scale = jax.jit(
        lambda p, i, t: model.apply({"params": p}, i, t)
    )(params, img, ids)
    assert iemb.shape == (2, 16) and temb.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(temb), axis=-1), 1.0, atol=1e-5)

    # BPE routing: a model without an HF text tower gets the CLIP tokenizer
    tok = get_tokenizer(dataclasses.replace(cfg, text=TextConfig(context_length=13)))
    out = tok(["a photo of a cat"])
    assert out.shape == (1, 13)
    np.testing.assert_array_equal(out[0], tokenize("a photo of a cat", 13)[0])


def _seq_logprob(model, params, img, tokens, eot_id):
    """Sum of next-token log-probs along a generated sequence, stopping at
    (and including) the first EOT."""
    out = model.apply({"params": params}, img, tokens)
    logp = jax.nn.log_softmax(np.asarray(out["logits"], np.float32), axis=-1)
    t = np.asarray(tokens)
    total = np.zeros(t.shape[0])
    for b in range(t.shape[0]):
        for pos in range(1, t.shape[1]):
            total[b] += logp[b, pos - 1, t[b, pos]]
            if t[b, pos] == eot_id:
                break
    return total


def test_coca_beam_search(coca_setup):
    from clipself_tpu.models.coca import beam_search, generate

    model, params, img, _, cfg = coca_setup
    # length_penalty=0 selects by raw cumulative log-prob, where beam >= greedy
    beam = beam_search(
        model, params, img, sot_id=1, eot_id=2, max_len=8, num_beams=4,
        length_penalty=0.0,
    )
    beam = np.asarray(beam)
    assert beam.shape == (2, 8)
    assert (beam[:, 0] == 1).all()

    # SOUND invariant (beam>=greedy is NOT guaranteed — the greedy prefix
    # can be pruned mid-search): a 1-beam search IS greedy decoding
    greedy = np.asarray(generate(model, params, img, sot_id=1, eot_id=2, max_len=8))
    beam1 = np.asarray(
        beam_search(model, params, img, sot_id=1, eot_id=2, max_len=8,
                    num_beams=1, length_penalty=0.0)
    )
    np.testing.assert_array_equal(beam1, greedy)

    # grouped variant runs and returns well-formed output
    grouped = np.asarray(
        beam_search(model, params, img, sot_id=1, eot_id=2, max_len=8,
                    num_beams=4, num_beam_groups=2)
    )
    assert grouped.shape == (2, 8) and (grouped[:, 0] == 1).all()


def test_coca_top_p_and_processors(coca_setup):
    from clipself_tpu.models.coca import generate

    model, params, img, _, cfg = coca_setup
    out = np.asarray(generate(
        model, params, img, sot_id=1, eot_id=2, max_len=8, top_p=0.9,
        rng=jax.random.PRNGKey(5),
    ))
    assert out.shape == (2, 8) and (out[:, 0] == 1).all()

    # min_len forbids EOT before position min_len
    out2 = np.asarray(generate(
        model, params, img, sot_id=1, eot_id=2, max_len=8, min_len=5,
    ))
    assert (out2[:, 1:5] != 2).all()

    # repetition penalty: seen tokens' logits are penalized (HF semantics:
    # positive logits divided, negative multiplied), pad excluded
    from clipself_tpu.models.coca import _apply_processors

    logits = jnp.asarray([[2.0, -1.0, 0.5, 3.0]])
    tokens = jnp.asarray([[1, 3, 0, 0]], jnp.int32)  # seen: 1, 3 (0 = pad)
    out_l = np.asarray(_apply_processors(
        logits, tokens, jnp.asarray(2), eot_id=99, pad_id=0, min_len=1,
        repetition_penalty=2.0,
    ))
    np.testing.assert_allclose(out_l[0], [2.0, -2.0, 0.5, 1.5])

    # penalized generation still well-formed end to end
    out3 = np.asarray(generate(
        model, params, img, sot_id=1, eot_id=2, max_len=8,
        repetition_penalty=1.5,
    ))
    assert out3.shape == (2, 8)
    assert (out3 >= 0).all() and (out3 < cfg.text.vocab_size).all()


def test_create_model_and_transforms():
    """Reference main entry point parity (`factory.py:267-350`): distill
    types get the [det, crop] transform pair for both train and val."""
    from PIL import Image

    from clipself_tpu.models.factory import create_model_and_transforms

    model, params, pt, pv = create_model_and_transforms(
        "EVA02-CLIP-Tiny-Test", dtype=jnp.float32, det_image_size=64
    )
    assert isinstance(pt, list) and len(pt) == 2 and pv is pt
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (48, 80, 3), np.uint8)
    )
    det = pt[0](img)
    crop = pt[1](img)
    assert det.shape == (64, 64, 3)  # ResizeLongest + pad to square det size
    assert crop.shape[-1] == 3 and max(crop.shape[:2]) == 32  # tower input size

    # non-distill type: train is the plain crop transform
    _, _, pt2, pv2 = create_model_and_transforms(
        "EVA02-CLIP-Tiny-Test", dtype=jnp.float32, det_image_size=64,
        dataset_type="coco_caption",
    )
    assert callable(pt2) and isinstance(pv2, list)


def test_coca_top_p_keeps_top_p_mass(coca_setup):
    """HF TopPLogitsWarper semantics: a tiny top_p collapses the nucleus to
    the single top token, so sampling is rng-independent (the inverted
    formulation would keep ~99% of the mass and vary with the rng)."""
    from clipself_tpu.models.coca import generate

    model, params, img, _, _ = coca_setup
    outs = [
        np.asarray(generate(
            model, params, img, sot_id=1, eot_id=2, max_len=8, top_p=0.01,
            rng=jax.random.PRNGKey(seed),
        ))
        for seed in range(3)
    ]
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])
    greedy = np.asarray(generate(model, params, img, sot_id=1, eot_id=2, max_len=8))
    np.testing.assert_array_equal(outs[0], greedy)


def test_hf_text_tower_pad_token_mask():
    """The default attention mask must use the trunk's pad_token_id
    (RoBERTa-family pads with 1): implicit and explicit masks agree."""
    from clipself_tpu.models.hf_text import HFTextTower

    tower = HFTextTower(
        "roberta", output_dim=16,
        hf_config_kwargs=dict(
            hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=64, vocab_size=100, max_position_embeddings=40,
        ),
    )
    rng = np.random.default_rng(0)
    ids = np.full((2, 12), 1, np.int32)  # roberta pad_token_id == 1
    ids[:, 0] = 0  # BOS
    ids[0, 1:8] = rng.integers(3, 100, 7)
    ids[1, 1:5] = rng.integers(3, 100, 4)
    ids = jnp.asarray(ids)
    params = tower.init(jax.random.PRNGKey(0), ids)["params"]
    implicit = tower.apply({"params": params}, ids)
    explicit = tower.apply(
        {"params": params}, ids, (np.asarray(ids) != 1).astype(np.int32)
    )
    np.testing.assert_allclose(
        np.asarray(implicit), np.asarray(explicit), atol=1e-6
    )
    # and the two batch rows must differ (pads masked out, real tokens differ)
    assert np.abs(np.asarray(implicit)[0] - np.asarray(implicit)[1]).max() > 1e-4


def test_hf_trunk_param_graft():
    """`load_hf_trunk_params` swaps the text trunk subtree for pretrained
    FlaxAutoModel weights (structure-checked)."""
    from transformers import AutoConfig, FlaxAutoModel

    from clipself_tpu.core.config import CLIPConfig, TextConfig, VisionConfig
    from clipself_tpu.models.factory import create_model
    from clipself_tpu.models.hf_text import load_hf_trunk_params

    hf_kwargs = dict(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, vocab_size=100, max_position_embeddings=80,
    )
    cfg = CLIPConfig(
        embed_dim=16,
        vision=VisionConfig(image_size=32, patch_size=8, layers=1, width=32, head_width=16),
        text=TextConfig(hf_model_name="bert", hf_model_config=hf_kwargs),
        name="hf-graft-test",
    )
    model, params = create_model(cfg, dtype=jnp.float32)
    donor = FlaxAutoModel.from_config(AutoConfig.for_model("bert", **hf_kwargs))
    grafted = load_hf_trunk_params(params, donor.params)
    a = jax.tree.leaves(grafted["text"]["trunk"])[0]
    b = jax.tree.leaves(donor.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # non-trunk params untouched
    va = jax.tree.leaves(grafted["visual"])[0]
    vb = jax.tree.leaves(params["visual"])[0]
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    # structure mismatch is a loud error
    import pytest as _pytest

    with _pytest.raises(ValueError):
        load_hf_trunk_params(params, {"wrong": jnp.zeros((1,))})


def test_openai_resnet_config_inference():
    """RN config inference reads the stem width off the stage-1 bottleneck
    (reference model.py:435), not the attnpool output dim."""
    from clipself_tpu.models.openai import config_from_openai_state_dict
    from clipself_tpu.models.factory import create_model
    from clipself_tpu.models.torch_io import export_state_dict

    cfg = get_model_config("RN-Tiny-Test")
    _, params = create_model(cfg, dtype=jnp.float32)
    sd = export_state_dict(params, cfg)
    openai_sd = {(k[5:] if k.startswith("text.") else k): v for k, v in sd.items()}
    inferred = config_from_openai_state_dict(openai_sd)
    assert inferred.vision.width == cfg.vision.width
    assert inferred.vision.resnet_layers == cfg.vision.resnet_layers
    assert inferred.embed_dim == cfg.embed_dim


def test_convnext_config_family_registered():
    """The reference's convnext config family (11 JSONs, timm trunk) builds
    through the factory (reference `model_configs/convnext_*.json` +
    `timm_model.py:29-239`)."""
    from clipself_tpu.core.config import get_model_config, list_models
    from clipself_tpu.models.factory import create_model

    names = [n for n in list_models() if n.startswith("convnext_")]
    assert len(names) == 11
    cfg = get_model_config("convnext_base_w")
    assert cfg.embed_dim == 640 and cfg.vision.timm_model_name == "convnext_base"
    assert cfg.vision.image_size == 256
    model, params = create_model(cfg, init=False)
    assert params is None  # module builds without eager init
    cfg_d = get_model_config("convnext_large_d")
    assert cfg_d.vision.timm_proj == "mlp"


def test_trunk_adapter_factory_route_and_hf_import():
    """`create_model` must build the FlaxTrunkAdapter tower from a config
    (`vision_cfg.hf_trunk_name`, VERDICT r2 #5), and `load_hf_trunk_params`
    must import a torch HF checkpoint whose forward then matches torch."""
    import torch
    from transformers import ViTConfig, ViTModel

    from clipself_tpu.core.config import get_model_config
    from clipself_tpu.models.factory import create_model
    from clipself_tpu.models.trunk_adapter import load_hf_trunk_params

    cfg = get_model_config("hf-vit-tiny-test")
    assert cfg.vision.hf_trunk_name == "vit"
    model, params = create_model(cfg, dtype=jnp.float32)

    torch.manual_seed(0)
    hf = ViTModel(ViTConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, image_size=32, patch_size=8, num_channels=3,
    ), add_pooling_layer=False).eval()
    rng = np.random.default_rng(2)
    head = rng.normal(size=(16, 32)).astype(np.float32) * 0.1
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    sd["head.weight"] = head
    params = load_hf_trunk_params(sd, dict(params), cfg)

    img = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        tokens = hf(torch.from_numpy(img).permute(0, 3, 1, 2)).last_hidden_state
        want = tokens[:, 0].numpy() @ head.T
    got = model.apply({"params": params}, jnp.asarray(img), method="encode_image")
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)
