"""Benchmark: episodic throughput at the paper protocol (eval or train step).

Measures episodes/sec/chip of the full CWT pipeline — frozen ResNet-50
PSPNet features for support+query at 473px, the fused 200-step classifier
inner loop, the CWT weight update, and query logits — on the attached TPU.
BENCH_MODE=train instead times the meta-training step (value_and_grad through
the CWT over the vmapped episode program; reference hot path:
src/train.py:222-267).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "episodes/sec/chip",
     "vs_baseline": N, "baseline": "...", "mfu": N, "flops_per_episode": N,
     "compile_s": N}

Baseline: the PyTorch reference publishes no throughput number; BASELINE.md
documents an estimate of ~1 episode/sec on a V100 (batch 1, 200 Python-level
SGD steps per episode, src/test.py "Average runtime / run"). vs_baseline
divides by that ESTIMATE — the 'baseline' field labels it as such. The
durable perf claim is the MFU field: XLA-cost-analysis FLOPs of the compiled
program / measured time / chip peak (bf16 peak for the device kind).

Env knobs: BENCH_MODE (eval|train|head|pretrain|backbone, default eval),
BENCH_EPISODE_BATCH (default 32; head defaults 4), BENCH_BATCHES (default
24), BENCH_IMAGE_SIZE (default 473), BENCH_DTYPE (float32|bfloat16),
BENCH_SHOT (default 1), BENCH_HEAD (head mode, default mmn),
BENCH_PRETRAIN_BATCH (pretrain mode, default 16). The JSON also carries the
per-batch-rate spread (p10/p50/p90) and timed-batch count so a stall-heavy
run is visible in the record itself.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_EPISODES_PER_SEC = 1.0  # documented ESTIMATE: torch reference on V100
BASELINE_LABEL = "estimated 1.0 eps/s (torch ref, V100, batch 1; BASELINE.md)"

# chip peak matmul throughput (FLOP/s) by device_kind substring, bf16.
# fp32 runs through multi-pass MXU at a fraction of this; MFU is reported
# against the bf16 peak in both cases (conservative for fp32 runs).
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6": 918e12,        # v6e (Trillium)
    "cpu": 1e11,
}


def _device_peak(dev) -> float:
    kind = getattr(dev, "device_kind", "cpu")
    for k, v in PEAK_FLOPS.items():
        if k.lower() in str(kind).lower():
            return v
    return 0.0


def _progress(msg: str) -> None:
    """Stage marker on stderr (BENCH_QUIET=1 silences): on a remote-compile
    transport a first-ever program can take many minutes with no client
    output, so show where a run is instead of looking hung."""
    if os.environ.get("BENCH_QUIET") != "1":
        print(f"[bench {time.strftime('%H:%M:%S')}] {msg}",
              file=sys.stderr, flush=True)


def _cost_flops(compiled) -> float:
    """Total FLOPs of a compiled program per XLA's cost analysis (0 if n/a)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


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
    from few_shot_seg_cwt_tpu.train.optim import build_optimizer

    mode = os.environ.get("BENCH_MODE", "eval")
    # head mode keeps (E, 60, 60, 60, 60, 10) NeighConsensus activations
    # alive for the backward pass (~0.5 GB/episode fp32) — default to a
    # batch that fits v5e HBM with headroom. Eval defaults are per-dtype
    # fit points (BENCH.md round-5 batch x dtype matrix): fp32 40
    # (13.39 of 15.75 GB; 48 compiles ~0.3 GB past HBM), bf16 64
    # (13.80 GB, 134.8 eps/s — the measured top of the batch sweep)
    _dt_env = os.environ.get("BENCH_DTYPE", "float32")
    _eval_default = "64" if _dt_env == "bfloat16" else "40"
    e_batch = int(os.environ.get("BENCH_EPISODE_BATCH",
                                 "4" if mode.startswith("head") else _eval_default))
    # 24 timed batches (~8s of device time at the protocol shape): with the
    # transport's transient stalls, 8 batches left the reported median
    # anywhere in a ±10% band — the r2 driver run (92.7) and the documented
    # run (100.6) disagreed for exactly this reason (VERDICT r2 weak #1)
    n_batches = int(os.environ.get("BENCH_BATCHES", "24"))
    size = int(os.environ.get("BENCH_IMAGE_SIZE", "473"))
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    shot = int(os.environ.get("BENCH_SHOT", "1"))

    cfg = default_cfg()
    cfg.image_size = size
    cfg.compute_dtype = dtype
    # BENCH_BF16_STAGES: mixed per-stage policy (e.g. "stem,layer1,layer2")
    cfg.bf16_stages = os.environ.get("BENCH_BF16_STAGES") or None
    cfg.shot = shot
    # time-decomposition knob: 0 isolates backbone+CWT cost (protocol is 200)
    cfg.adapt_iter = int(os.environ.get("BENCH_ADAPT_ITER", cfg.adapt_iter))
    # generic overrides: BENCH_OPTS="key value key value ..." (--opts grammar)
    if os.environ.get("BENCH_OPTS"):
        from few_shot_seg_cwt_tpu.config import merge_cfg_from_list

        cfg = merge_cfg_from_list(cfg, os.environ["BENCH_OPTS"].split())
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
    if mode != "pretrain":  # pretrain stages plain image batches instead
        for s in range(3):
            host = make_episode_batch(seed=s + 1, e=e_total, size=size, shot=cfg.shot)
            episodes = {k: host[k] for k in ("s_img", "s_label", "q_img", "q_label", "cls")}
            if mesh is not None:
                episodes = shard_batch(episodes, mesh)
            else:
                episodes = jax.device_put(episodes)
            episode_batches.append(episodes)
            _progress(f"staged episode batch {s+1}/3 on device")

    if mode == "backbone":
        # decomposition probe: JUST the frozen feature extractor on the same
        # image volume as an eval batch (2 images/episode) — isolates conv
        # efficiency from the episodic machinery (inner loop/CWT/metrics)
        from few_shot_seg_cwt_tpu.models.pspnet import cast_backbone_io

        imgs = jnp.concatenate(
            [episode_batches[0]["s_img"].reshape(-1, size, size, 3),
             episode_batches[0]["q_img"]], axis=0,
        )
        vars_c, imgs = cast_backbone_io(engine.stage_policy, vars_b, imgs)

        # BENCH_BACKBONE_MATERIALIZE=1 returns the (B, 60, 60, 512) features
        # themselves (forces their HBM materialization + layout, like the
        # episodic consumers do) instead of a fused scalar reduction
        if os.environ.get("BENCH_BACKBONE_MATERIALIZE") == "1":
            # the features become a program OUTPUT (HBM-materialized with the
            # layout the episodic consumers see); the timed sync fetches only
            # the scalar co-output, not the 88 MB array
            def fn(v, im):
                feat = engine.backbone.apply(
                    v, im, train=False,
                    method=engine.backbone.extract_features, mutable=False)[0]
                return feat, feat[0, 0, 0, 0]

            sync = lambda out: np.asarray(out[1])
        else:
            fn = lambda v, im: engine.backbone.apply(
                v, im, train=False, method=engine.backbone.extract_features,
                mutable=False)[0].sum()
            sync = np.asarray
        t_c = time.time()
        compiled = jax.jit(fn).lower(vars_c, imgs).compile()
        compile_s = time.time() - t_c
        flops_total = _cost_flops(compiled)
        sync(compiled(vars_c, imgs))
        imgs_variants = [imgs + jnp.float32(i).astype(imgs.dtype)
                         for i in range(3)]
        batch_times = []
        for i in range(n_batches):
            t0 = time.time()
            sync(compiled(vars_c, imgs_variants[i % 3]))
            batch_times.append(time.time() - t0)
        metric_name = f"backbone-only images/sec/chip equivalent ({dtype})"
    elif mode == "pretrain":
        # stage-1 supervised PSPNet training step (reference src/pretrain.py:
        # 102-121): full backbone forward+backward with live BN stats, PPM,
        # label-smoothed CE, two-param-group SGD — the one training workload
        # where the whole network trains (BENCH_PRETRAIN_BATCH images/step,
        # default 16; reference trains at batch 12/GPU). fp32 (training the
        # backbone in bf16 needs a master-weight story the product doesn't
        # ship); BENCH_DTYPE is ignored here.
        from few_shot_seg_cwt_tpu.models import build_pspnet
        from few_shot_seg_cwt_tpu.train.pretrain import (
            make_pretrain_step, param_group_optimizer)

        b = int(os.environ.get("BENCH_PRETRAIN_BATCH", "16"))
        cfg.num_classes_tr = 16           # PASCAL-5i base classes per fold
        cfg.compute_dtype = "float32"
        cfg.bf16_stages = None
        model = build_pspnet(cfg)
        variables = jax.jit(
            lambda: model.init({"params": jax.random.PRNGKey(0)}, probe, train=False)
        )()
        params, batch_stats = variables["params"], variables["batch_stats"]
        optimizer = param_group_optimizer(cfg, params, iters_per_epoch=1000)
        opt_state = optimizer.init(params)

        rng_np = np.random.default_rng(0)
        imgs = [jax.device_put(rng_np.normal(size=(b, size, size, 3)).astype(np.float32))
                for _ in range(3)]
        gts = [jax.device_put(rng_np.integers(0, cfg.num_classes_tr,
                                              size=(b, size, size)).astype(np.int32))
               for _ in range(3)]
        step = make_pretrain_step(model, optimizer, cfg)
        step_rngs = [jax.random.PRNGKey(100 + i) for i in range(n_batches + 1)]

        t_c = time.time()
        _progress("compiling pretrain step")
        compiled = step.lower(params, batch_stats, opt_state,
                              imgs[0], gts[0], step_rngs[-1]).compile()
        compile_s = time.time() - t_c
        _progress(f"pretrain step compiled in {compile_s:.0f}s; warming up")
        flops_total = _cost_flops(compiled)

        params, batch_stats, opt_state, m = compiled(
            params, batch_stats, opt_state, imgs[0], gts[0], step_rngs[-1])
        np.asarray(m["loss"])

        batch_times = []
        for i in range(n_batches):
            t0 = time.time()
            params, batch_stats, opt_state, m = compiled(
                params, batch_stats, opt_state, imgs[i % 3], gts[i % 3], step_rngs[i])
            np.asarray(m["loss"])
            batch_times.append(time.time() - t0)
        e_batch = b            # per-chip unit for the MFU math below
        e_total = b * n_chips  # rate unit: images/sec/chip
        metric_name = f"pretrain train-step images/sec/chip (@{size}px, batch {b}, float32)"
    elif mode == "head":
        # extension-head meta-training step (BENCH_HEAD, default mmn): the
        # fork's main research model — per-layer 3600x3600 correlation
        # matmuls + center-pivot 4D convs + blended readout on top of the
        # shared episodic prologue (reference hot path: src/train_kshot.py
        # loss loop -> mmn.py forward -> match.py corr_forward). Hyperparams
        # are the published pascal_mmn.yaml values.
        from few_shot_seg_cwt_tpu.episodic.heads import HeadEngine
        from few_shot_seg_cwt_tpu.train.train_head import init_head_trainables

        head = os.environ.get("BENCH_HEAD", "mmn")
        for k, v in dict(conv4d="red", temp=20.0, att_wt=0.2,
                         loss_type="wt_dc", rmid="l34", wa=True,
                         proj_drop=0.5, att_drop=0.5, trans_lr=0.0015).items():
            cfg[k] = v
        # BENCH_DTYPE=bfloat16 here means the full AMP analog the published
        # config runs (pascal_mmn.yaml use_amp: True): bf16 backbone AND
        # bf16 head compute, f32 losses/master weights
        cfg.use_amp = dtype == "bfloat16"
        h_engine = HeadEngine(cfg, head)
        _progress(f"initializing {head} head trainables (2 jitted programs)")
        trainables = init_head_trainables(cfg, h_engine, vars_b)
        _progress("head trainables initialized")
        optimizer = build_optimizer(cfg, base_lr=cfg.trans_lr, use_schedule=False)
        opt_state = optimizer.init(trainables)
        if mesh is not None:
            trainables = replicate(trainables, mesh)
            opt_state = replicate(opt_state, mesh)
        step = h_engine.make_train_step(optimizer)
        step_rngs = [jax.random.PRNGKey(100 + i) for i in range(n_batches + 1)]

        t_c = time.time()
        _progress("compiling head train step")
        compiled = step.lower(
            trainables, opt_state, vars_b, episode_batches[0], step_rngs[-1], None
        ).compile()
        compile_s = time.time() - t_c
        _progress(f"head step compiled in {compile_s:.0f}s; warming up")
        flops_total = _cost_flops(compiled)

        trainables, opt_state, m = compiled(
            trainables, opt_state, vars_b, episode_batches[0], step_rngs[-1], None
        )
        np.asarray(m["loss_mean"])

        batch_times = []
        for i in range(n_batches):
            t0 = time.time()
            trainables, opt_state, metrics = compiled(
                trainables, opt_state, vars_b,
                episode_batches[i % len(episode_batches)], step_rngs[i], None,
            )
            np.asarray(metrics["loss_mean"])
            batch_times.append(time.time() - t0)
        metric_name = (f"{head}-head train-step episodes/sec/chip "
                       f"({shot}-shot @{size}px, {dtype})")
    elif mode in ("head_eval", "head_serve"):
        # extension-head EVAL protocol (head_eval: the per-variant validate
        # loop — deterministic forward + per-class I/U, reference
        # src/test.py:103-254 via each trainer's validate) and label-free
        # SERVING (head_serve: tools/export_serve's argmax-mask program).
        # Both iterate episodes through lax.map (the rank-5 layout fence,
        # episodic/heads.py) — this mode measures exactly that serialization;
        # cfg eval_episode_tile (BENCH_OPTS) vmaps the map in chunks.
        from few_shot_seg_cwt_tpu.episodic.heads import HeadEngine
        from few_shot_seg_cwt_tpu.train.train_head import init_head_trainables

        head = os.environ.get("BENCH_HEAD", "mmn")
        for k, v in dict(conv4d="red", temp=20.0, att_wt=0.2,
                         loss_type="wt_dc", rmid="l34", wa=True,
                         proj_drop=0.5, att_drop=0.5, trans_lr=0.0015).items():
            cfg[k] = v
        cfg.use_amp = dtype == "bfloat16"
        if head == "cca":
            # incremental multi-way engine (train_cca semantics); synthetic
            # episode cls ids are 1..16
            from few_shot_seg_cwt_tpu.episodic.cca import CCAEngine

            cfg.num_classes_tr = 17
            h_engine = CCAEngine(cfg)
        else:
            h_engine = HeadEngine(cfg, head)
        _progress(f"initializing {head} head trainables")
        trainables = init_head_trainables(cfg, h_engine, vars_b)
        _progress("head trainables initialized")

        if mode == "head_eval":
            fn = h_engine.eval_metrics_batch
            out_key = "loss"

            def call(batch, rngs):
                return fn(trainables, vars_b, batch, rngs, None)

            sync = lambda out: np.asarray(out[out_key])
        else:
            def serve_batch(trainables, vars_b, batch, rngs):
                f = lambda er: h_engine.serve_episode(vars_b, trainables,
                                                      er[0], er[1])
                t = int(cfg.get("eval_episode_tile", 1) or 1)
                if t > 1 and rngs.shape[0] % t == 0:
                    return jax.lax.map(f, (batch, rngs), batch_size=t)
                return jax.lax.map(f, (batch, rngs))

            fn = jax.jit(serve_batch)

            def call(batch, rngs):
                return fn(trainables, vars_b, batch, rngs)

            sync = lambda out: np.asarray(out[0, 0, 0])

        rng_sets = [jax.random.split(jax.random.PRNGKey(50 + i), e_total)
                    for i in range(n_batches + 1)]
        t_c = time.time()
        _progress(f"compiling {mode} program")
        out = call(episode_batches[0], rng_sets[-1])
        sync(out)
        compile_s = time.time() - t_c
        flops_total = 0.0
        _progress(f"{mode} compiled+warm in {compile_s:.0f}s")

        batch_times = []
        for i in range(n_batches):
            t0 = time.time()
            out = call(episode_batches[i % len(episode_batches)], rng_sets[i])
            sync(out)
            batch_times.append(time.time() - t0)
        tile = int(cfg.get("eval_episode_tile", 1) or 1)
        metric_name = (f"{head}-head {'eval' if mode == 'head_eval' else 'serve'}"
                       f" episodes/sec/chip ({shot}-shot @{size}px, {dtype}"
                       f"{', tile ' + str(tile) if tile > 1 else ''})")
    elif mode == "train":
        optimizer = build_optimizer(cfg, base_lr=cfg.trans_lr, use_schedule=False)
        trans_params = vars_t["params"]
        vars_t_extra = {k: v for k, v in vars_t.items() if k != "params"}
        opt_state = optimizer.init(trans_params)
        if mesh is not None:
            opt_state = replicate(opt_state, mesh)
        # BENCH_TRAIN_METRICS=0 times the loss-only step (no IoU tail) — the
        # hot-loop variant the trainers run between log steps
        with_metrics = os.environ.get("BENCH_TRAIN_METRICS", "1") != "0"
        train_step = engine.make_train_step(optimizer, with_metrics=with_metrics)
        step_rngs = [jax.random.PRNGKey(100 + i) for i in range(n_batches + 1)]

        t_c = time.time()
        _progress("compiling train step")
        lowered = train_step.lower(
            trans_params, opt_state, vars_t_extra, vars_b,
            episode_batches[0], step_rngs[-1],
        )
        compiled = lowered.compile()
        compile_s = time.time() - t_c
        flops_total = _cost_flops(compiled)

        # warm-up execution
        p, s_, m = compiled(trans_params, opt_state, vars_t_extra, vars_b,
                            episode_batches[0], step_rngs[-1])
        np.asarray(m["loss"])

        batch_times = []
        for i in range(n_batches):
            t0 = time.time()
            trans_params, opt_state, metrics = compiled(
                trans_params, opt_state, vars_t_extra, vars_b,
                episode_batches[i % len(episode_batches)], step_rngs[i],
            )
            np.asarray(metrics["loss"])  # force completion of each step
            batch_times.append(time.time() - t0)
        metric_name = (f"train-step episodes/sec/chip ({shot}-shot @{size}px, "
                       f"adapt_iter={cfg.adapt_iter}, {dtype}"
                       f"{'' if with_metrics else ', loss-only'})")
    else:
        rng_arrays = [
            jax.device_put(jax.random.split(jax.random.PRNGKey(100 + i), e_total))
            for i in range(n_batches + 1)
        ]

        # DEFAULT: the full protocol-metrics program (inner loop + CWT +
        # 473px upsample + argmax + per-class I/U) — what validate_transformer
        # actually runs, and only tiny (E,2) metric arrays leave the device.
        # BENCH_EVAL_PROGRAM=logits times the logits-returning program
        # instead; its (E,60,60,2)x2 outputs make it transport-sensitive
        # (measured 91.5 vs 100.4 eps/s on a degraded tunnel, same compute).
        program = os.environ.get("BENCH_EVAL_PROGRAM", "metrics")
        if program == "logits":
            eval_fn = engine.eval_batch
        elif program == "no_cwt":
            # decomposition probe: inner loop + raw-classifier metrics, no CWT
            base = engine.eval_metrics_batch_no_cwt
            eval_fn = jax.jit(lambda vb, vt, ep, rngs: base(vb, ep, rngs))
        else:
            eval_fn = engine.eval_metrics_batch
        t_c = time.time()
        _progress("compiling eval program")
        lowered = eval_fn.lower(
            vars_b, vars_t, episode_batches[0], rng_arrays[-1]
        )
        compiled = lowered.compile()
        compile_s = time.time() - t_c
        flops_total = _cost_flops(compiled)

        out = compiled(vars_b, vars_t, episode_batches[0], rng_arrays[-1])
        sync_key = next(k for k in ("pred_q", "loss", "loss0") if k in out)
        np.asarray(out[sync_key])

        batch_times = []
        for i in range(n_batches):
            t0 = time.time()
            out = compiled(
                vars_b, vars_t, episode_batches[i % len(episode_batches)], rng_arrays[i]
            )
            np.asarray(out[sync_key]).ravel()[0]  # force completion of each step
            batch_times.append(time.time() - t0)
        stage_tag = f", bf16:{cfg.bf16_stages}" if cfg.bf16_stages else ""
        metric_name = (f"episodes/sec/chip ({shot}-shot eval @{size}px, "
                       f"adapt_iter={cfg.adapt_iter}, {dtype}{stage_tag})")

    # median batch time: robust to the transport's transient multi-second
    # stalls (observed ~±10%+ run-to-run noise, occasionally 30% on short
    # runs), which otherwise poison a mean over total elapsed time
    t_batch = float(np.median(batch_times))
    eps_per_sec = e_total / t_batch
    eps_per_sec_chip = eps_per_sec / n_chips
    # report the spread so one JSON line shows whether the run was stall-y:
    # p10 of time -> fast tail (p90 of rate), p90 of time -> slow tail
    bt = np.asarray(batch_times)
    rate = lambda t: round(e_total / float(t) / n_chips, 3)
    spread = {
        "p90": rate(np.percentile(bt, 10)),
        "p50": rate(np.percentile(bt, 50)),
        "p10": rate(np.percentile(bt, 90)),
    }

    peak = _device_peak(devices[0])
    # cost_analysis() reports PER-DEVICE flops of the SPMD-partitioned module,
    # i.e. the flops for e_total/n_chips episodes — divide by the per-chip
    # episode count, not the global one
    flops_per_episode = flops_total / e_batch if flops_total else 0.0
    mfu = (flops_per_episode * eps_per_sec_chip / peak) if (peak and flops_total) else 0.0

    result = {
        "metric": metric_name,
        "value": round(eps_per_sec_chip, 3),
        "unit": "images/sec/chip" if mode == "pretrain" else "episodes/sec/chip",
        "vs_baseline": round(eps_per_sec_chip / REF_EPISODES_PER_SEC, 2),
        "baseline": BASELINE_LABEL,
        "mfu": round(mfu, 4),
        "flops_per_episode": flops_per_episode,
        "compile_s": round(compile_s, 1),
        "eps_per_sec_chip_p10": spread["p10"],
        "eps_per_sec_chip_p50": spread["p50"],
        "eps_per_sec_chip_p90": spread["p90"],
        "timed_batches": n_batches,
    }
    # peak HBM, two sources: the runtime allocator's live view (absent on
    # some transports) and the compiler's static reservation for the timed
    # program — the number that decides whether a batch size fits
    try:
        stats = devices[0].memory_stats() or {}
        if "peak_bytes_in_use" in stats:
            result["peak_hbm_gb"] = round(stats["peak_bytes_in_use"] / 2**30, 3)
    except Exception:
        pass
    try:
        mem = compiled.memory_analysis()
        hbm = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
               + mem.output_size_in_bytes + mem.generated_code_size_in_bytes)
        result["program_hbm_gb"] = round(hbm / 2**30, 3)
        result["program_temp_gb"] = round(mem.temp_size_in_bytes / 2**30, 3)
    except Exception:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
