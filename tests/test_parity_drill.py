"""One-command parity pipeline drill on fabricated assets.

Chains preflight -> record_episodes -> replay eval -> ab_dtype --replay --pth
through tools/parity_drill.py against a fabricated asset tree (synthetic
images + a .pth generated from the actual reference torch modules), so the
day real PASCAL/COCO assets land the ENTIRE chain is known-good as one
command rather than stage-by-stage (reference workflow: src/test.py:54-91,
convert_pth.py).
"""

import os

import numpy as np
import pytest

from tests import ref_compat
from tests.ref_compat import HAVE_REF

pytestmark = [
    pytest.mark.skipif(not HAVE_REF, reason="reference tree not mounted"),
    pytest.mark.slow,  # torch module serialization + two full eval passes
]


def test_parity_drill_end_to_end(tmp_path):
    import cv2
    import torch

    from few_shot_seg_cwt_tpu.config import default_cfg
    from few_shot_seg_cwt_tpu.tools.parity_drill import main as drill
    from few_shot_seg_cwt_tpu.utils.dirs import get_model_dir_trans

    # --- fabricated dataset: 8 images, classes 1/2 (split-0 val classes) --- #
    root = tmp_path / "voc"
    (root / "img").mkdir(parents=True)
    (root / "lab").mkdir()
    rng = np.random.default_rng(11)
    lines = []
    for i in range(8):
        img = rng.integers(0, 255, size=(90, 110, 3)).astype(np.uint8)
        lab = np.zeros((90, 110), np.uint8)
        lab[5:75, 5:75] = 1 if i < 4 else 2  # 4900 px >= 2*32*32 filter
        cv2.imwrite(str(root / "img" / f"{i}.jpg"), img)
        cv2.imwrite(str(root / "lab" / f"{i}.png"), lab)
        lines.append(f"img/{i}.jpg lab/{i}.png\n")
    lst = root / "val.txt"
    lst.write_text("".join(lines))

    # --- fabricated weights from the actual reference torch modules ------- #
    from src.model.pspnet import PSPNet as TorchPSPNet
    from src.model.transformer import MultiHeadAttentionOne as TorchMHA

    torch.manual_seed(7)
    mcfg = default_cfg()
    mcfg.pretrained = False
    mcfg.heads = 1
    model = TorchPSPNet(mcfg, zoom_factor=8, use_ppm=True).eval()
    trans = TorchMHA(1, 512, 512, 512, dropout=0.5).eval()
    psp_pth = tmp_path / "stage1.pth"
    torch.save({"epoch": 100, "state_dict": {
        f"module.{k}": v for k, v in model.state_dict().items()}}, psp_pth)

    # --- drill config file ------------------------------------------------ #
    cfg_yaml = tmp_path / "drill.yaml"
    cfg_yaml.write_text(f"""
DATA:
  data_root: {root}
  train_list: {lst}
  val_list: {lst}
  train_name: pascal
  train_split: 0
  workers: 0
EVAL:
  image_size: 65
  heads: 1
  pretrained: False
  adapt_iter: 3
  test_num: 4
  n_runs: 1
  episode_batch: 2
  shot: 1
  manual_seed: 2021
  resume_weights: {psp_pth}
  model_dir: {tmp_path / 'model_ckpt'}
  ckpt_used: best
  save_models: False
""")
    from few_shot_seg_cwt_tpu.config import load_cfg

    cfg = load_cfg(str(cfg_yaml))
    trans_dir = get_model_dir_trans(cfg)
    os.makedirs(trans_dir, exist_ok=True)
    torch.save({"epoch": 20, "state_dict": trans.state_dict()},
               os.path.join(trans_dir, "best.pth"))

    # --- the one command --------------------------------------------------- #
    summary = drill(["--config", str(cfg_yaml), "--reference", ref_compat.REF,
                     "--workdir", str(tmp_path / "work")])
    assert summary["ok"] is True
    assert summary["preflight"] == "ready"
    assert os.path.isfile(summary["episode_log"])
    with open(summary["episode_log"]) as f:
        assert sum(1 for _ in f) == 4  # n_runs * test_num
    assert 0.0 <= summary["replay_miou"] <= 1.0
    ab = summary["ab"]
    assert ab["weights"] == "imported .pth"
    assert np.isfinite(ab["miou_fp32"]) and np.isfinite(ab["miou_bf16"])
