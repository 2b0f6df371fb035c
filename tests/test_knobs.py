"""Central knob registry (core/knobs.py): resolution order, CLI promotion.

SURVEY §5 flags the reference's scattered env-var config channels (`RoPE`,
`ENV_TYPE`) as a quirk to fix; the rebuild routes every runtime knob through
one documented registry with CLI flags for the user-facing ones."""

import pytest

from clipself_tpu.core import knobs


@pytest.fixture(autouse=True)
def _clean_overrides():
    saved = dict(knobs._overrides)
    knobs._overrides.clear()
    yield
    knobs._overrides.clear()
    knobs._overrides.update(saved)


def test_resolution_order(monkeypatch):
    monkeypatch.delenv("CLIPSELF_PAD_MULTIPLE", raising=False)
    assert knobs.get("pad_multiple") == 128  # declared default
    monkeypatch.setenv("CLIPSELF_PAD_MULTIPLE", "512")
    assert knobs.get("pad_multiple") == 512  # env beats default
    knobs.set("pad_multiple", 256)
    assert knobs.get("pad_multiple") == 256  # programmatic beats env
    knobs.set("pad_multiple", None)
    assert knobs.get("pad_multiple") == 512  # cleared -> env again


def test_bool_knobs(monkeypatch):
    monkeypatch.delenv("CLIPSELF_FUSED_FLASH_BWD", raising=False)
    assert knobs.get("fused_flash_bwd") is True
    monkeypatch.setenv("CLIPSELF_FUSED_FLASH_BWD", "0")
    assert knobs.get("fused_flash_bwd") is False


def test_unknown_knob_rejected():
    with pytest.raises(KeyError):
        knobs.get("no_such_knob")
    with pytest.raises(KeyError):
        knobs.set("no_such_knob", 1)


def test_trainer_flags_promote_to_knobs(monkeypatch):
    """--eval-ann-bucket / --pad-multiple / --scoped-vmem-kib reach the
    registry; unset flags leave env/default resolution alone."""
    monkeypatch.delenv("CLIPSELF_EVAL_ANN_BUCKET", raising=False)
    from clipself_tpu.train.main import apply_knob_flags, parse_args

    args = parse_args(
        ["--train-data", "synthetic", "--eval-ann-bucket", "0",
         "--pad-multiple", "512", "--scoped-vmem-kib", "16384"]
    )
    apply_knob_flags(args)
    assert knobs.get("eval_ann_bucket") == 0
    assert knobs.get("pad_multiple") == 512
    assert knobs.get("scoped_vmem_kib") == 16384

    knobs._overrides.clear()
    args = parse_args(["--train-data", "synthetic"])
    apply_knob_flags(args)
    assert knobs.get("eval_ann_bucket") == 25  # default untouched


def test_describe_lists_every_knob():
    text = knobs.describe()
    for name in knobs._KNOBS:
        assert name in text
