"""Decomposition microbenchmark for the MMN/MatchNet head hot path.

BENCH_MODE=head showed the mmn-head train step at ~2.2 eps/s fp32 (463 ms per
episode) — two orders below the CWT eval/train programs. This tool times each
stage of that program in isolation on the attached device so kernel work aims
at the real bottleneck (reference hot path: src/train_kshot.py loss loop ->
mmn.py forward -> match.py corr_forward -> conv4d.py):

  corr        the two 3600x3600 cosine-correlation matmuls (1024/2048 ch)
  wa          WeightAverage local attention on the stage features
  mm          mutual_matching max-normalization of the (60,60,60,60,C) volume
  pivot_a     one CenterPivotConv4d 2->10 (transpose + 2 convs + add)
  pivot_b     one CenterPivotConv4d 10->10
  ncons       the full symmetric NeighConsensus stack (2->10->10->1) forward
  ncons_grad  value_and_grad of mean(ncons(x)) wrt params   [the train cost]
  readout     softmax(corr*temp) @ v attention readout

Usage: python -m tools.bench_head_parts [fp32|bf16] [reps]
Prints one JSON line per part: {"part", "ms", "ms_p90", "dtype"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _time(fn, variants, reps: int, sync) -> tuple[float, float]:
    """Time fn over distinct input variants: the axon transport memoizes
    byte-identical requests (see BENCH.md), so every timed call must differ
    (the caller supplies reps+1 variants: one per timed call + warmup)."""
    assert len(variants) > reps, (len(variants), reps)
    sync(fn(*variants[0]))
    ts = []
    for i in range(reps):
        args = variants[i + 1]
        t0 = time.time()
        sync(fn(*args))
        ts.append((time.time() - t0) * 1e3)
    return float(np.median(ts)), float(np.percentile(ts, 90))


def main() -> None:
    dtype_arg = sys.argv[1] if len(sys.argv) > 1 else "fp32"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from few_shot_seg_cwt_tpu.models.conv4d import CenterPivotConv4d
    from few_shot_seg_cwt_tpu.models.matching import NeighConsensus
    from few_shot_seg_cwt_tpu.models.msm import WeightAverage
    from few_shot_seg_cwt_tpu.ops.corr import (get_corr, masked_attention_readout,
                                               mutual_matching)

    dt = jnp.bfloat16 if dtype_arg in ("bf16", "bfloat16") else jnp.float32
    h = int(os.environ.get("PARTS_FEAT", "60"))
    key = jax.random.PRNGKey(0)
    # block_until_ready does not force remote completion on the axon
    # transport; fetching bytes does (same sync bench.py uses). Each part
    # returns a scalar reduction so the fetch is 4 bytes, not the output.
    sync = lambda o: np.asarray(o)
    # one distinct input variant per timed call + warmup: a repeat of a
    # byte-identical request can be served from the transport memo cache.
    # Each part materializes ITS OWN reps+1 variants just before timing and
    # frees them after — holding all parts' variant lists at once scales
    # device memory by reps (the (1,60,60,60,60,10) volume alone is 518 MB,
    # so reps=30 would exceed HBM before any timing ran).
    NV = reps + 1

    def mk(shape):
        return [jax.device_put(jax.random.normal(jax.random.PRNGKey(i), shape, dt))
                for i in range(NV)]

    SHAPES = {
        "f1024": (1, h, h, 1024),
        "f2048": (1, h, h, 2048),
        "vol2": (1, h, h, h, h, 2),
        "vol10": (1, h, h, h, h, 10),
        "corr2d": (1, h * h, h * h),
        "v512": (1, h, h, 512),
    }
    probe = {k: jnp.zeros(v, dt) for k, v in SHAPES.items()}  # init-only

    results = []

    def rec(part, fn, *arg_names, consts=()):
        arg_lists = [mk(SHAPES[n]) for n in arg_names]
        variants = [tuple(consts) + args for args in zip(*arg_lists)]
        scalar_fn = jax.jit(lambda *a: jax.tree.reduce(
            lambda acc, t: acc + jnp.sum(t.astype(jnp.float32)), fn(*a),
            jnp.float32(0)))
        ms, p90 = _time(scalar_fn, variants, reps, sync)
        del arg_lists, variants  # free this part's device buffers
        results.append({"part": part, "ms": round(ms, 2),
                        "ms_p90": round(p90, 2), "dtype": dtype_arg})
        print(json.dumps(results[-1]), flush=True)

    rec("corr_1024+2048", lambda a, b: (get_corr(a, a), get_corr(b, b)),
        "f1024", "f2048")

    wa = WeightAverage()
    wa_vars = wa.init(key, probe["f1024"])
    rec("wa_1024", lambda v, x: wa.apply(v, x), "f1024", consts=(wa_vars,))

    rec("mm_vol2", mutual_matching, "vol2")
    rec("mm_vol10", mutual_matching, "vol10")

    piv_a = CenterPivotConv4d(out_channels=10)
    pa_vars = piv_a.init(key, probe["vol2"])
    rec("pivot_2to10", lambda v, x: piv_a.apply(v, x), "vol2", consts=(pa_vars,))

    piv_b = CenterPivotConv4d(out_channels=10)
    pb_vars = piv_b.init(key, probe["vol10"])
    rec("pivot_10to10", lambda v, x: piv_b.apply(v, x), "vol10",
        consts=(pb_vars,))

    ncons = NeighConsensus(kernel_sizes=(3, 3, 3), channels=(10, 10, 1))
    nc_vars = ncons.init(key, probe["vol2"])
    rec("ncons_fwd", lambda v, x: ncons.apply(v, x), "vol2", consts=(nc_vars,))

    def nc_loss(params, x):
        return jnp.mean(ncons.apply(params, x).astype(jnp.float32))

    rec("ncons_grad", jax.grad(nc_loss), "vol2", consts=(nc_vars,))

    rec("readout", lambda c, v: masked_attention_readout(c, v, temp=20.0),
        "corr2d", "v512")


if __name__ == "__main__":
    main()
