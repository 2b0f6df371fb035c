"""Geometric rel-pos-bias table resize (checkpoint import).

The reference's `resize_rel_pos_embed` (`eva_clip/utils.py:139-204`) is dead
code upstream (calls the nonexistent `F.interpolate.interp2d`), so these pin
our working re-derivation of the BEiT algorithm instead: geometric source
coordinates + separable natural-cubic-spline interpolation.
"""

import numpy as np
import pytest

from clipself_tpu.models.torch_io import (
    _cubic_spline_1d,
    _geometric_coords,
    resize_rel_pos_table_np,
)


def test_identity_passthrough():
    t = np.random.default_rng(0).normal(size=(13 * 13 + 3, 4)).astype(np.float32)
    assert resize_rel_pos_table_np(t, t.shape[0]) is t


def test_geometric_coords_span_and_symmetry():
    # only upsizing: equal sizes take the identity path before coords are
    # built, and the bisection's 1.01 ratio floor can't express q -> 1
    for src, dst in ((7, 9), (13, 17), (13, 27), (27, 31)):
        x = _geometric_coords(src, dst)
        assert len(x) == 2 * (src // 2) + 1
        np.testing.assert_allclose(x, -x[::-1], atol=1e-9)  # symmetric
        # the src//2 geometric terms sum to the DESTINATION half-width
        # (reference `eva_clip/utils.py:164-171`): the target integer grid
        # [-dst//2, dst//2] always interpolates, never extrapolates
        np.testing.assert_allclose(x[-1], dst // 2, atol=1e-4)


def test_cubic_spline_matches_scipy_natural():
    scipy_interp = pytest.importorskip("scipy.interpolate")
    rng = np.random.default_rng(1)
    x = np.sort(rng.uniform(-5, 5, size=9))
    y = rng.normal(size=(9, 3))
    xq = np.linspace(x[0], x[-1], 17)
    got = _cubic_spline_1d(x, y, xq)
    want = scipy_interp.CubicSpline(x, y, bc_type="natural")(xq)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_resize_shapes_extra_rows_and_center():
    rng = np.random.default_rng(2)
    heads = 4
    src_win = 7  # (2*7-1)^2 + 3 rows
    t = rng.normal(size=((2 * src_win - 1) ** 2 + 3, heads)).astype(np.float32)
    dst_rows = (2 * 9 - 1) ** 2 + 3
    out = resize_rel_pos_table_np(t, dst_rows)
    assert out.shape == (dst_rows, heads)
    # the 3 extra (cls) rows pass through untouched
    np.testing.assert_array_equal(out[-3:], t[-3:])
    # relative offset (0,0) sits at a knot (coordinate 0) in both grids ->
    # the spline reproduces it
    src_size, dst_size = 2 * src_win - 1, 2 * 9 - 1
    center_src = t[: src_size * src_size].reshape(src_size, src_size, heads)[
        src_size // 2, src_size // 2
    ]
    center_dst = out[: dst_size * dst_size].reshape(dst_size, dst_size, heads)[
        dst_size // 2, dst_size // 2
    ]
    np.testing.assert_allclose(center_dst, center_src, atol=1e-5)


def test_importer_resizes_rel_pos_on_window_mismatch():
    """End-to-end: a state dict with a smaller rel-pos window imports into a
    model with a larger one (the reference would route this through
    `resize_rel_pos_embed`)."""
    import jax.numpy as jnp

    from clipself_tpu.core.config import CLIPConfig, TextConfig, VisionConfig
    from clipself_tpu.models.factory import create_model
    from clipself_tpu.models.torch_io import export_state_dict, import_state_dict

    def build(img):
        cfg = CLIPConfig(
            embed_dim=16,
            vision=VisionConfig(
                image_size=img, layers=1, width=32, head_width=16, patch_size=8,
                use_rel_pos_bias=True, eva_model_name="relpos-resize-test",
            ),
            text=TextConfig(context_length=8, vocab_size=64, width=32, heads=2, layers=1),
            name=f"relpos-resize-{img}",
        )
        return (cfg,) + create_model(cfg, dtype=jnp.float32)

    cfg_s, _, params_s = build(32)   # 4x4 grid
    cfg_l, model_l, params_l = build(48)  # 6x6 grid
    sd = export_state_dict(params_s, cfg_s)
    merged = import_state_dict(sd, dict(params_l), cfg_l, strict=False)
    img = jnp.asarray(np.random.default_rng(3).normal(size=(1, 48, 48, 3)), jnp.float32)
    out = model_l.apply({"params": merged}, img, method="encode_image")
    assert np.isfinite(np.asarray(out)).all()
