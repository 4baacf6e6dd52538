"""Config loader/override semantics (parity with reference src/util.py:315-438)."""

import pytest

from few_shot_seg_cwt_tpu.config import default_cfg, load_cfg, merge_cfg_from_list


def test_defaults_have_core_keys():
    cfg = default_cfg()
    assert cfg.adapt_iter == 200
    assert cfg.bottleneck_dim == 512
    assert cfg.image_size == 473
    assert cfg.get("rmid") is None
    assert cfg.get("missing", "fallback") == "fallback"


def test_yaml_sections_flatten(tmp_path):
    f = tmp_path / "exp.yaml"
    f.write_text("DATA:\n  train_name: coco\nTRAIN:\n  epochs: 20\n")
    cfg = load_cfg(str(f))
    assert cfg.train_name == "coco"
    assert cfg.epochs == 20
    assert cfg.adapt_iter == 200  # default preserved


def test_opts_override_with_literal_eval():
    cfg = default_cfg()
    out = merge_cfg_from_list(cfg, ["epochs", "3", "augmentations", "['resize']", "cls_lr", "0.1"])
    assert out.epochs == 3 and isinstance(out.epochs, int)
    assert out.augmentations == ["resize"]
    assert out.cls_lr == 0.1
    # original untouched
    assert cfg.epochs != 3 or cfg.epochs == 50


def test_opts_reject_unknown_key():
    with pytest.raises(AssertionError):
        merge_cfg_from_list(default_cfg(), ["nonexistent_key", "1"])


def test_opts_type_mismatch_raises():
    with pytest.raises(ValueError):
        merge_cfg_from_list(default_cfg(), ["epochs", "'a string'"])


def test_attribute_roundtrip():
    cfg = default_cfg()
    cfg.new_field = 7
    assert cfg["new_field"] == 7
    with pytest.raises(AttributeError):
        _ = cfg.not_there
