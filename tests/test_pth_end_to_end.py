"""On-disk .pth -> converter -> evaluation, end to end.

Closes the real-weights chain as far as this environment allows (the released
PASCAL/COCO weights are absent): serialize *actual reference torch modules*
to .pth files the way the reference saves them (reference: src/train.py:
141-163 {'epoch','state_dict'} with DDP 'module.' prefixes, src/test.py:54-91
load path), then drive this framework's convert/import tools and the full
eval entry point on those files. The day real assets appear, the same
commands run unchanged.
"""

import os

import numpy as np
import pytest

from tests.ref_compat import HAVE_REF

pytestmark = [
    pytest.mark.skipif(not HAVE_REF, reason="reference tree not mounted"),
    pytest.mark.slow,  # ~2 min of torch-module serialization + full eval entry
]

import jax
import jax.numpy as jnp

from few_shot_seg_cwt_tpu.config import default_cfg
from few_shot_seg_cwt_tpu.episodic.engine import EpisodicEngine
from few_shot_seg_cwt_tpu.utils.ckpt import (
    import_cwt,
    import_pspnet,
    load_ckpt,
    load_torch_checkpoint,
)


@pytest.fixture(scope="module")
def pth_files(tmp_path_factory):
    """Reference-format .pth files from actual reference torch modules."""
    import torch
    from src.model.pspnet import PSPNet as TorchPSPNet
    from src.model.transformer import MultiHeadAttentionOne as TorchMHA

    torch.manual_seed(7)
    cfg = default_cfg()
    cfg.pretrained = False
    cfg.heads = 1
    model = TorchPSPNet(cfg, zoom_factor=8, use_ppm=True).eval()
    trans = TorchMHA(cfg.heads, 512, 512, 512, dropout=0.5).eval()

    root = tmp_path_factory.mktemp("pth")
    psp_pth = os.path.join(root, "pspnet_best.pth")
    cwt_pth = os.path.join(root, "best.pth")
    # DDP-style 'module.' prefix, as pretrained stage-1 ckpts ship
    sd = {f"module.{k}": v for k, v in model.state_dict().items()}
    torch.save({"epoch": 100, "state_dict": sd}, psp_pth)
    torch.save({"epoch": 20, "state_dict": trans.state_dict()}, cwt_pth)
    return model, trans, psp_pth, cwt_pth


def test_convert_cli_roundtrip(pth_files, tmp_path):
    """convert_ckpt CLI: strip-module + to-flax produce importer-identical trees."""
    from few_shot_seg_cwt_tpu.utils.convert_ckpt import main as convert

    model, trans, psp_pth, cwt_pth = pth_files

    stripped = os.path.join(tmp_path, "stripped.pth")
    convert(["strip-module", psp_pth, stripped])
    sd = load_torch_checkpoint(stripped)
    assert not any(k.startswith("module.") for k in sd)

    flax_ckpt = os.path.join(tmp_path, "psp.ckpt")
    convert(["to-flax", "pspnet", stripped, flax_ckpt])
    mem = import_pspnet(model.state_dict())
    disk = load_ckpt(flax_ckpt, like=jax.tree.map(np.asarray, mem))
    for a, b in zip(jax.tree.leaves(mem), jax.tree.leaves(disk)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cwt_ckpt = os.path.join(tmp_path, "cwt.ckpt")
    convert(["to-flax", "cwt", cwt_pth, cwt_ckpt])
    mem_t = import_cwt(trans.state_dict())
    disk_t = load_ckpt(cwt_ckpt, like=jax.tree.map(np.asarray, mem_t))
    for a, b in zip(jax.tree.leaves(mem_t), jax.tree.leaves(disk_t)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_entry_point_from_pth(pth_files, tmp_path):
    """train.test.main on .pth files: full protocol runs, logits match memory.

    Mirrors the reference eval launch (src/test.py:54-91: resume_weights .pth
    with 'module.' keys + transformer ckpt from the model-dir schema).
    """
    from few_shot_seg_cwt_tpu.train import test as test_entry
    from few_shot_seg_cwt_tpu.utils.dirs import get_model_dir_trans

    model, trans, psp_pth, cwt_pth = pth_files

    cfg = default_cfg()
    cfg.pretrained = False
    cfg.heads = 1
    cfg.image_size = 33
    cfg.adapt_iter = 5
    cfg.synthetic_data = True
    cfg.test_num = 4
    cfg.n_runs = 1
    cfg.episode_batch = 2
    cfg.workers = 0
    cfg.debug = False
    cfg.save_models = False
    cfg.model_dir = os.path.join(tmp_path, "model_ckpt")
    cfg.ckpt_used = "best"
    cfg.resume_weights = psp_pth

    trans_dir = get_model_dir_trans(cfg)
    os.makedirs(trans_dir, exist_ok=True)
    import shutil

    shutil.copy(cwt_pth, os.path.join(trans_dir, "best.pth"))

    miou = test_entry.main(cfg)
    assert np.isfinite(miou) and 0.0 <= miou <= 1.0

    # disk-loaded weights produce the exact same episode logits as the
    # in-memory importer (which test_engine_parity pins to torch)
    engine = EpisodicEngine(cfg)
    from few_shot_seg_cwt_tpu.train.common import _overlay, init_backbone

    base = init_backbone(type(cfg)({**cfg, "resume_weights": None}), engine)
    sd = load_torch_checkpoint(psp_pth)
    vars_b = _overlay(base, import_pspnet(sd, arch=cfg.arch, skip_classifier=True))
    vars_b_mem = _overlay(
        base, import_pspnet(model.state_dict(), arch=cfg.arch, skip_classifier=True)
    )
    vars_t = import_cwt(load_torch_checkpoint(cwt_pth))
    vars_t_mem = import_cwt(trans.state_dict())

    rng = np.random.default_rng(11)
    episode = {
        "s_img": jnp.asarray(rng.standard_normal((1, 33, 33, 3)).astype(np.float32)),
        "s_label": jnp.asarray(rng.integers(0, 2, size=(1, 33, 33)).astype(np.int32)),
        "q_img": jnp.asarray(rng.standard_normal((33, 33, 3)).astype(np.float32)),
        "q_label": jnp.asarray(rng.integers(0, 2, size=(33, 33)).astype(np.int32)),
        "cls": jnp.asarray(1, jnp.int32),
    }
    key = jax.random.PRNGKey(3)
    out_disk = jax.jit(engine.eval_episode)(vars_b, vars_t, episode, key)
    out_mem = jax.jit(engine.eval_episode)(vars_b_mem, vars_t_mem, episode, key)
    np.testing.assert_array_equal(
        np.asarray(out_disk["pred_q"]), np.asarray(out_mem["pred_q"])
    )


def test_preflight_ready_and_not_ready(pth_files, tmp_path, capsys):
    """tools/preflight: one command that says 'ready for the parity run' or
    exactly what's absent (VERDICT r2 item 8)."""
    import cv2
    import yaml

    from few_shot_seg_cwt_tpu.tools.preflight import main as preflight
    from few_shot_seg_cwt_tpu.utils.dirs import get_model_dir_trans

    model, trans, psp_pth, cwt_pth = pth_files

    # tiny coherent data tree
    root = tmp_path / "voc"
    (root / "img").mkdir(parents=True)
    (root / "lab").mkdir()
    rng = np.random.default_rng(3)
    lines = []
    for i in range(4):
        img = rng.integers(0, 255, size=(60, 60, 3)).astype(np.uint8)
        lab = np.zeros((60, 60), np.uint8)
        lab[5:55, 5:55] = 1
        cv2.imwrite(str(root / "img" / f"{i}.jpg"), img)
        cv2.imwrite(str(root / "lab" / f"{i}.png"), lab)
        lines.append(f"img/{i}.jpg lab/{i}.png\n")
    lst = root / "val.txt"
    lst.write_text("".join(lines))

    cfg_yaml = tmp_path / "pf.yaml"
    cfg_yaml.write_text(yaml.safe_dump({
        "DATA": {"data_root": str(root), "train_list": str(lst),
                 "val_list": str(lst)},
        "MODEL": {"resume_weights": str(psp_pth),
                  "model_dir": str(tmp_path / "model_ckpt")},
    }))

    trans_cfg_probe = __import__(
        "few_shot_seg_cwt_tpu.config", fromlist=["load_cfg"]
    ).load_cfg(str(cfg_yaml))
    trans_dir = get_model_dir_trans(trans_cfg_probe)
    os.makedirs(trans_dir, exist_ok=True)
    import shutil

    shutil.copy(cwt_pth, os.path.join(trans_dir, "best.pth"))

    rc = preflight(["--config", str(cfg_yaml), "--sample", "4"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "READY" in out and "train.test" in out

    # break the weights path -> must fail and say where it looked
    rc = preflight(["--config", str(cfg_yaml), "--sample", "4",
                    "--opts", "resume_weights", str(tmp_path / "nope")])
    out = capsys.readouterr().out
    assert rc == 1 and "stage-1 weights" in out and "NOT READY" in out
