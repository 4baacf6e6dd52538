"""Benchmark: 1-shot episodic evaluation throughput at the paper protocol.

Measures episodes/sec/chip of the full CWT eval pipeline — frozen ResNet-50
PSPNet features for support+query at 473px, the fused 200-step classifier
inner loop, the CWT weight update, and query logits — on the attached TPU.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "episodes/sec/chip", "vs_baseline": N}

Baseline: the PyTorch reference evaluates ~1 episode/sec on a V100
(src/test.py "Average runtime / run" over 1000 episodes with batch 1 and 200
Python-level SGD steps per episode; see BASELINE.md). REF_EPISODES_PER_SEC
encodes that estimate; vs_baseline = value / REF_EPISODES_PER_SEC.

Env knobs: BENCH_EPISODE_BATCH (default 16), BENCH_BATCHES (default 8),
BENCH_IMAGE_SIZE (default 473), BENCH_DTYPE (float32|bfloat16).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_EPISODES_PER_SEC = 1.0  # PyTorch reference on V100 (documented estimate)


def main() -> None:
    import jax

    # persistent compilation cache: the first-ever compile of the fused
    # episodic program is expensive; later runs (and rounds) reuse it
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from few_shot_seg_cwt_tpu.config import default_cfg
    from few_shot_seg_cwt_tpu.data.synthetic import make_episode_batch
    from few_shot_seg_cwt_tpu.episodic.engine import EpisodicEngine
    from few_shot_seg_cwt_tpu.parallel.mesh import make_mesh, shard_batch, replicate

    e_batch = int(os.environ.get("BENCH_EPISODE_BATCH", "32"))
    n_batches = int(os.environ.get("BENCH_BATCHES", "8"))
    size = int(os.environ.get("BENCH_IMAGE_SIZE", "473"))
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    shot = int(os.environ.get("BENCH_SHOT", "1"))

    cfg = default_cfg()
    cfg.image_size = size
    cfg.compute_dtype = dtype
    cfg.shot = shot
    engine = EpisodicEngine(cfg)

    devices = jax.devices()
    n_chips = len(devices)
    mesh = make_mesh() if n_chips > 1 else None
    e_total = e_batch * n_chips

    probe = jnp.zeros((1, 33, 33, 3), jnp.float32)
    vars_b = jax.jit(
        lambda: engine.backbone.init({"params": jax.random.PRNGKey(0)}, probe, train=False)
    )()
    d = cfg.bottleneck_dim
    vars_t = jax.jit(
        lambda: engine.cwt.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, 2, d)),
            jnp.zeros((1, 4, 4, d)),
            jnp.zeros((1, 4, 4, d)),
        )
    )()
    if mesh is not None:
        vars_b = replicate(vars_b, mesh)
        vars_t = replicate(vars_t, mesh)

    # pre-stage episode batches on device (H2D excluded from timing: the real
    # pipeline prefetches) and give every timed call a distinct rng array so
    # the transport layer can never serve a memoized result
    episode_batches = []
    for s in range(3):
        host = make_episode_batch(seed=s + 1, e=e_total, size=size, shot=cfg.shot)
        episodes = {k: host[k] for k in ("s_img", "s_label", "q_img", "q_label", "cls")}
        if mesh is not None:
            episodes = shard_batch(episodes, mesh)
        else:
            episodes = jax.device_put(episodes)
        episode_batches.append(episodes)
    rng_arrays = [
        jax.device_put(jax.random.split(jax.random.PRNGKey(100 + i), e_total))
        for i in range(n_batches + 1)
    ]

    # warm-up / compile
    out = engine.eval_batch(vars_b, vars_t, episode_batches[0], rng_arrays[-1])
    np.asarray(out["pred_q"])

    t0 = time.time()
    for i in range(n_batches):
        out = engine.eval_batch(
            vars_b, vars_t, episode_batches[i % len(episode_batches)], rng_arrays[i]
        )
        np.asarray(out["pred_q"][0, 0, 0])  # force completion of each step
    elapsed = time.time() - t0

    eps_per_sec = n_batches * e_total / elapsed
    eps_per_sec_chip = eps_per_sec / n_chips
    result = {
        "metric": f"episodes/sec/chip ({shot}-shot eval @{size}px, adapt_iter=200, {dtype})",
        "value": round(eps_per_sec_chip, 3),
        "unit": "episodes/sec/chip",
        "vs_baseline": round(eps_per_sec_chip / REF_EPISODES_PER_SEC, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
