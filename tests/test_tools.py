"""Tooling: log summarizer, visualizer, ckpt converter, extra metrics."""

import numpy as np
import pytest

from few_shot_seg_cwt_tpu.utils.extra_metrics import BinaryIoU, FullIoU
from few_shot_seg_cwt_tpu.utils.print_log import scrape, summarize
from few_shot_seg_cwt_tpu.utils.visualize import Masker, decode_seg_map


def test_print_log_scrape(tmp_path):
    p = tmp_path / "log.txt"
    p.write_text(
        "noise\nmIoU---Val result: mIoU 0.4510.\nstuff\n"
        "mIoU---Val result: mIoU 0.5630.\n"
    )
    vals = scrape(str(p))
    assert vals == [0.4510, 0.5630]
    best = summarize([str(p)])
    assert abs(best[str(p)] - 0.563) < 1e-9


def test_masker_composite(tmp_path, rng):
    m = Masker()
    s_imgs = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    s_labels = rng.integers(0, 2, size=(1, 16, 16)).astype(np.int32)
    q_img = rng.standard_normal((16, 16, 3)).astype(np.float32)
    q_label = rng.integers(0, 2, size=(16, 16)).astype(np.int32)
    pred = rng.integers(0, 2, size=(16, 16)).astype(np.int32)
    strip = m.episode_composite(s_imgs, s_labels, q_img, q_label, pred)
    assert strip.shape == (16, 48, 3) and strip.dtype == np.uint8
    out = tmp_path / "vis" / "ep.png"
    m.save(strip, str(out))
    assert out.exists()


def test_decode_seg_map_ignore_white():
    mask = np.array([[0, 1], [255, 2]])
    rgb = decode_seg_map(mask)
    assert (rgb[1, 0] == 255).all()
    assert (rgb[0, 0] == 0).all()


def test_binary_iou_tracker(rng):
    t = BinaryIoU()
    pred = rng.integers(0, 2, size=(64, 64))
    target = pred.copy()
    t.update(pred, target)
    assert t.miou == pytest.approx(1.0)
    t2 = BinaryIoU()
    t2.update(1 - pred, pred)
    assert t2.miou == pytest.approx(0.0)


def test_full_iou_matches_binary(rng):
    pred = rng.integers(0, 3, size=(50, 50))
    target = rng.integers(0, 3, size=(50, 50))
    target[0, :5] = 255
    f = FullIoU(3)
    f.update(pred, target)
    # cross-check one class against direct computation
    valid = target != 255
    c = 1
    inter = np.sum((pred == c) & (target == c) & valid)
    union = np.sum((((pred == c) & valid) | (target == c)) & valid)
    assert f.iou[c] == pytest.approx(inter / union)
    assert 0.0 <= f.pixel_accuracy <= 1.0


def test_convert_ckpt_strip_module(tmp_path):
    import torch

    from few_shot_seg_cwt_tpu.utils.convert_ckpt import main

    sd = {"module.layer0.0.weight": torch.zeros(2, 2)}
    src = tmp_path / "in.pth"
    dst = tmp_path / "out.pth"
    torch.save({"state_dict": sd}, str(src))
    main(["strip-module", str(src), str(dst)])
    out = torch.load(str(dst), weights_only=False)["state_dict"]
    assert list(out) == ["layer0.0.weight"]


def test_convert_ckpt_to_flax_cwt(tmp_path):
    import torch

    from few_shot_seg_cwt_tpu.utils.convert_ckpt import main
    from few_shot_seg_cwt_tpu.utils.ckpt import load_ckpt

    d = 8
    sd = {
        "w_qkvs.weight": torch.randn(d, d),
        "fc.weight": torch.randn(d, d),
        "fc.bias": torch.randn(d),
        "layer_norm.weight": torch.ones(d),
        "layer_norm.bias": torch.zeros(d),
    }
    src = tmp_path / "trans.pth"
    dst = tmp_path / "trans.ckpt"
    torch.save({"state_dict": sd}, str(src))
    main(["to-flax", "cwt", str(src), str(dst)])
    tree = load_ckpt(str(dst))
    assert tree["params"]["w_qkvs"]["kernel"].shape == (d, d)


def test_bench_loader_tool(tmp_path):
    """The host input-pipeline benchmark runs end to end and reports a rate."""
    from few_shot_seg_cwt_tpu.tools.bench_loader import main

    r = main(["--episodes", "8", "--batch", "4", "--image-size", "65",
              "--images", "8", "--workers", "0"])
    assert r["value"] > 0 and r["episodes"] == 8


@pytest.mark.slow
@pytest.mark.parametrize("mode,extra", [
    ("head", {"BENCH_EPISODE_BATCH": "2"}),
    ("pretrain", {"BENCH_PRETRAIN_BATCH": "2"}),
])
def test_bench_modes(mode, extra, monkeypatch, capsys):
    """bench.py's auxiliary modes (extension-head / stage-1 train step)
    compile and report a finite rate at a tiny shape."""
    import importlib
    import json

    import bench

    monkeypatch.setenv("BENCH_MODE", mode)
    monkeypatch.setenv("BENCH_IMAGE_SIZE", "33")
    monkeypatch.setenv("BENCH_BATCHES", "2")
    monkeypatch.setenv("BENCH_ADAPT_ITER", "2")
    for k, v in extra.items():
        monkeypatch.setenv(k, v)
    importlib.reload(bench)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert result["value"] > 0 and np.isfinite(result["value"])
    assert str(mode if mode != "head" else "mmn") in result["metric"]
    assert result["timed_batches"] == 2
