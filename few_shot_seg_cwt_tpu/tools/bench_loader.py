"""Host input-pipeline benchmark: can the loader feed the chip?

The device pipeline evaluates ~100 episodes/sec/chip fp32 (BENCH.md); each
1-shot 473px episode is ~2.8 MB of decoded+transformed tensors, so the host
side (cv2 JPEG/PNG decode -> resize/pad/normalize -> collate) must sustain
~100 eps/s per chip to avoid becoming the bottleneck on a real TPU VM (the
reference's DataLoader faces the same task, src/dataset/dataset.py:61-68).

This tool fabricates an on-disk image tree (or uses --data-root/--list),
then measures EpisodeLoader throughput end to end — sampler, decode,
transforms (native C++ fused tail when built), worker threads, collation —
and reports episodes/sec vs the device rate.

Usage:
    python -m few_shot_seg_cwt_tpu.tools.bench_loader [--episodes 256]
        [--workers N] [--image-size 473] [--shot 1]
        [--data-root DIR --list FILE]   # real data instead of synthetic
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def fabricate_tree(root: str, n_images: int, side: int = 500) -> str:
    """PASCAL-layout jpg/png tree with >=2*32*32-px masks; returns list path."""
    import cv2

    os.makedirs(os.path.join(root, "img"), exist_ok=True)
    os.makedirs(os.path.join(root, "lab"), exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n_images):
        h = side + int(rng.integers(-60, 60))
        w = side + int(rng.integers(-60, 60))
        img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        lab = np.zeros((h, w), np.uint8)
        cls = 1 + i % 2
        lab[h // 8: 7 * h // 8, w // 8: 7 * w // 8] = cls
        cv2.imwrite(os.path.join(root, "img", f"{i}.jpg"), img)
        cv2.imwrite(os.path.join(root, "lab", f"{i}.png"), lab)
        lines.append(f"img/{i}.jpg lab/{i}.png\n")
    lst = os.path.join(root, "list.txt")
    with open(lst, "w") as f:
        f.writelines(lines)
    return lst


def _sweep(ns):
    """workers x native grid, one subprocess per point; prints each point's
    JSON line plus a final summary row (the BENCH.md worker-scaling table)."""
    import subprocess

    points = []
    for native_on in (True, False):
        for workers in (1, 2, 4, 8):
            env = dict(os.environ)
            if not native_on:
                env["FSS_NATIVE_DISABLE"] = "1"
            cmd = [sys.executable, "-m",
                   "few_shot_seg_cwt_tpu.tools.bench_loader",
                   "--episodes", str(ns.episodes), "--batch", str(ns.batch),
                   "--workers", str(workers),
                   "--image-size", str(ns.image_size), "--shot", str(ns.shot),
                   "--images", str(ns.images),
                   "--device-rate", str(ns.device_rate)]
            if ns.data_root and ns.list_file:
                cmd += ["--data-root", ns.data_root, "--list", ns.list_file]
            out = subprocess.run(cmd, capture_output=True, text=True, env=env)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1]
            r = json.loads(line)
            r["workers"] = workers
            r["native"] = native_on
            points.append(r)
            print(json.dumps(r), flush=True)
    best = max(points, key=lambda r: r["value"])
    print(json.dumps({
        "metric": f"host loader worker-scaling sweep ({ns.shot}-shot "
                  f"@{ns.image_size}px, host cpus={os.cpu_count()})",
        "best_eps_per_sec": best["value"],
        "best_workers": best["workers"],
        "best_native": best["native"],
        "chips_fed_at_device_rate": best["chips_fed_at_device_rate"],
        "curve_native": {str(r["workers"]): r["value"]
                         for r in points if r["native"]},
        "curve_python": {str(r["workers"]): r["value"]
                         for r in points if not r["native"]},
    }))
    return points


def main(argv=None):
    from ..config import default_cfg
    from ..data.episodic import EpisodicDataset
    from ..data.loader import EpisodeLoader
    from ..data.native import load_library

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--episodes", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 2)
    ap.add_argument("--image-size", type=int, default=473)
    ap.add_argument("--shot", type=int, default=1)
    ap.add_argument("--images", type=int, default=48,
                    help="synthetic tree size (images)")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--list", dest="list_file", default=None)
    ap.add_argument("--device-rate", type=float, default=100.0,
                    help="device episodes/sec/chip to compare against")
    ap.add_argument("--sweep", action="store_true",
                    help="measure a workers -> eps/s curve (1/2/4/8) with the "
                         "native transform tail on and off; one subprocess "
                         "per point (clean thread pools, native A/B via "
                         "FSS_NATIVE_DISABLE)")
    ns = ap.parse_args(argv)

    if ns.sweep:
        return _sweep(ns)

    cfg = default_cfg()
    cfg.image_size = ns.image_size
    cfg.shot = ns.shot
    cfg.workers = ns.workers
    cfg.scan_cache = None
    cfg.train_split = 3  # classes 1/2 are train classes of fold 3

    tmp = None
    if ns.data_root and ns.list_file:
        cfg.data_root, cfg.train_list = ns.data_root, ns.list_file
    else:
        tmp = tempfile.TemporaryDirectory(prefix="fss_loader_bench_")
        print(f"fabricating {ns.images}-image tree under {tmp.name} ...",
              file=sys.stderr)
        cfg.train_list = fabricate_tree(tmp.name, ns.images)
        cfg.data_root = tmp.name

    native = load_library() is not None
    ds = EpisodicDataset(cfg, train=True)
    loader = EpisodeLoader(ds, batch_size=ns.batch, shuffle=True,
                           num_workers=ns.workers)

    # warm-up batch (thread pool spin-up, cv2 caches)
    it = iter(loader)
    next(it)

    n_batches = max(1, ns.episodes // ns.batch)
    times = []
    done = 0
    t_total0 = time.time()
    while done < n_batches:
        t0 = time.time()
        try:
            next(it)
        except StopIteration:
            it = iter(loader)
            continue
        times.append(time.time() - t0)
        done += 1
    wall = time.time() - t_total0

    eps = n_batches * ns.batch
    rate = eps / wall
    per_batch = np.asarray(times)
    result = {
        "metric": f"host loader episodes/sec ({ns.shot}-shot @{ns.image_size}px, "
                  f"{ns.workers} workers, native={'yes' if native else 'no'})",
        "value": round(rate, 2),
        "unit": "episodes/sec",
        "p50_batch_s": round(float(np.median(per_batch)), 4),
        "episodes": eps,
        "chips_fed_at_device_rate": round(rate / ns.device_rate, 2),
        "mb_per_episode": round(
            (ns.shot + 1) * (ns.image_size ** 2) * 3 * 4 / 1e6
            + (ns.shot + 1) * (ns.image_size ** 2) * 4 / 1e6, 2),
    }
    print(json.dumps(result))
    if tmp is not None:
        tmp.cleanup()
    return result


if __name__ == "__main__":
    main()
