"""On-chip A/B: XLA 6D pivot vs Pallas MXU dot-form vs (optionally) VPU form.

One 10->10 center-pivot pair at the 473px protocol (60^4 volume), forward
and forward+grad. Usage: python -m tools.bench_pivot_mxu [reps] [ci] [co]
Prints one JSON line per variant: {"variant", "ms", "ms_p90"}.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    ci = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    co = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from few_shot_seg_cwt_tpu.models.conv4d import CenterPivotConv4d
    from few_shot_seg_cwt_tpu.ops.pallas_pivot import pivot_conv_flat
    from few_shot_seg_cwt_tpu.ops.pallas_pivot_mxu import pivot_conv_flat_mxu

    h = int(os.environ.get("PIVOT_FEAT", "60"))
    dims = (h, h, h, h)
    key = jax.random.PRNGKey(0)
    sync = lambda o: np.asarray(o)
    NV = reps + 1
    # flat volumes (1, ci, h*h, h*h); distinct per timed call (tunnel memo)
    xs = [jax.device_put(jax.random.normal(jax.random.PRNGKey(i),
                                           (1, ci, h * h, h * h), jnp.float32))
          for i in range(NV)]
    # PIVOT_DTYPE=bf16 hands the convs bf16 weights — the autocast path
    # (_promote demotes the volume, halving the MXU's im2col ingest)
    wdt = (jnp.bfloat16 if os.environ.get("PIVOT_DTYPE") == "bf16"
           else jnp.float32)
    wa = jax.random.normal(jax.random.PRNGKey(100), (3, 3, ci, co), wdt)
    wb = jax.random.normal(jax.random.PRNGKey(101), (3, 3, ci, co), wdt)
    bias = jax.random.normal(jax.random.PRNGKey(102), (co,), wdt)

    mod = CenterPivotConv4d(out_channels=co)
    params = {"params": {
        "conv_query": {"kernel": wa, "bias": bias * 0.25},
        "conv_support": {"kernel": wb, "bias": bias * 0.75},
    }}

    def xla_fwd(x):
        # the engine's actual non-Pallas route: one 6D conversion around the
        # XLA convs (matching run_match_model_flat's default path)
        b, c = x.shape[0], x.shape[1]
        x6 = x.reshape(b, c, h, h, h, h).transpose(0, 2, 3, 4, 5, 1)
        y = jax.nn.relu(mod.apply(params, x6))
        return y.transpose(0, 5, 1, 2, 3, 4).reshape(b, co, h * h, h * h)

    def mxu_fwd(x):
        return pivot_conv_flat_mxu(x, wa, wb, bias, dims=dims, relu=True)

    def vpu_fwd(x):
        return pivot_conv_flat(x, wa, wb, bias, dims=dims, relu=True)

    def timed(name, fn):
        f = jax.jit(lambda x: jnp.sum(fn(x).astype(jnp.float32)))
        t0 = time.time()
        sync(f(xs[0]))
        compile_s = time.time() - t0
        ts = []
        for i in range(reps):
            t0 = time.time()
            sync(f(xs[i + 1]))
            ts.append((time.time() - t0) * 1e3)
        print(json.dumps({"variant": name, "ms": round(float(np.median(ts)), 2),
                          "ms_p90": round(float(np.percentile(ts, 90)), 2),
                          "compile_s": round(compile_s, 1)}), flush=True)

    def timed_grad(name, fn):
        def loss(x):
            return jnp.sum(fn(x).astype(jnp.float32))
        f = jax.jit(lambda x: jnp.sum(jax.grad(loss)(x)))
        t0 = time.time()
        sync(f(xs[0]))
        compile_s = time.time() - t0
        ts = []
        for i in range(reps):
            t0 = time.time()
            sync(f(xs[i + 1]))
            ts.append((time.time() - t0) * 1e3)
        print(json.dumps({"variant": name + "_grad",
                          "ms": round(float(np.median(ts)), 2),
                          "ms_p90": round(float(np.percentile(ts, 90)), 2),
                          "compile_s": round(compile_s, 1)}), flush=True)

    which = os.environ.get("PIVOT_VARIANTS", "xla,mxu").split(",")
    fns = {"xla": xla_fwd, "mxu": mxu_fwd, "vpu": vpu_fwd}
    for name in which:
        timed(name, fns[name])
    if os.environ.get("PIVOT_GRAD", "1") == "1":
        for name in which:
            timed_grad(name, fns[name])
    # exactness check on-chip (mxu vs xla), catches silent miscompiles
    if "mxu" in which and "xla" in which:
        a = np.asarray(jax.jit(mxu_fwd)(xs[0]))
        b = np.asarray(jax.jit(xla_fwd)(xs[0]))
        err = float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))
        print(json.dumps({"variant": "mxu_vs_xla_relerr", "ms": err}), flush=True)


if __name__ == "__main__":
    main()
