"""Decomposition microbenchmark for the MMN/MatchNet head hot path.

Times each stage of the extension-head train program on the attached device
(reference hot path: src/train_kshot.py loss loop -> mmn.py forward ->
match.py corr_forward -> conv4d.py):

  corr          the 3600x3600 cosine-correlation matmuls (1024/2048 ch)
  wa            WeightAverage local attention on the stage features
  mm_vol10      mutual_matching fwd on the (60,60,60,60,10) volume
  mm_vjp_vol10  mutual_matching fwd+bwd wrt input (the post-consensus one)
  swap_vol10    one whole-volume plane transpose (symmetric mode)
  pivot_2to10   one CenterPivotConv4d 2->10 fwd (2 conv2d + add)
  pivot_10to10  one CenterPivotConv4d 10->10 fwd
  match_pipeline_fwd/grad   mm -> symmetric NeighConsensus (2->10->10->1)
                -> mm through the ACTIVE route (rank-4 default; set
                FSS_NCONS_R4=0 to time the 6D fallback)
  splane_nhwc / qplane_tr / qplane_hwnc (x _fwd/_grad)
                query-plane conv layout A/B: today's transpose+NHWC+
                transpose-back vs the transpose-free batch-on-dim-2
                ("HWNC") dimension-numbers conv, with the s-plane NHWC
                conv as the no-transpose floor
  readout       softmax(corr*temp) @ v attention readout fwd
  readout_vjp   readout fwd+bwd wrt (corr2d, v)

METHODOLOGY (round 4): every part runs as a K-step data-dependent
``lax.scan`` chain inside ONE jitted call, and the per-step cost is the
slope between a K-step and a 2K-step program: ``(t_2K - t_K) / K``. This is
the only timing that survives the axon transport, whose PER-CALL round-trip
floor is ~25-30 ms — as large as the ops being measured. The round-3
version of this tool timed one op per call and therefore reported
latency + op for every part; its conclusions ("a 10->10 pivot pair costs
~25 ms", "the convs are ingest-bound at their dtype") were artifacts of
that floor. Measured with this tool's chains: one 10->10 support-plane
conv is ~2.9 ms f32 / ~1.6 ms bf16 (see BENCH.md round 4).

Chains keep XLA honest (no CSE across steps) by threading the carry through
the cheapest input: conv/grad parts perturb the PARAMS (a few KB) by
(1 + c*1e-12); volume parts carry the volume itself (renormalized); the
readout perturbs the small value matrix. The reported number therefore
includes the chain's renormalization pass for mm_* parts (~1-2 extra volume
passes, annotated in "chain").

Usage: python -m tools.bench_head_parts [fp32|bf16] [K] [reps]
Prints one JSON line per part: {"part", "ms", "dtype", "chain"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _time_call(fn, variants, reps, sync):
    """Median wall time of fn over distinct input variants (one call each;
    the axon transport memoizes byte-identical requests)."""
    sync(fn(*variants[0]))
    ts = []
    for i in range(reps):
        t0 = time.time()
        sync(fn(*variants[i + 1]))
        ts.append((time.time() - t0) * 1e3)
    return float(np.median(ts))


def main() -> None:
    dtype_arg = sys.argv[1] if len(sys.argv) > 1 else "fp32"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from few_shot_seg_cwt_tpu.models.conv4d import CenterPivotConv4d
    from few_shot_seg_cwt_tpu.models.msm import WeightAverage
    from few_shot_seg_cwt_tpu.ops.corr import (get_corr, masked_attention_readout,
                                               mutual_matching)

    dt = jnp.bfloat16 if dtype_arg in ("bf16", "bfloat16") else jnp.float32
    h = int(os.environ.get("PARTS_FEAT", "60"))
    key = jax.random.PRNGKey(0)
    # fetching bytes is the only sync the axon transport honors
    sync = lambda o: np.asarray(o)

    def mk(shape, n):
        return [jax.device_put(jax.random.normal(jax.random.PRNGKey(97 + i),
                                                 shape, dt))
                for i in range(n)]

    SHAPES = {
        "f1024": (1, h, h, 1024),
        "f2048": (1, h, h, 2048),
        "vol2": (1, h, h, h, h, 2),
        "vol10": (1, h, h, h, h, 10),
        "corr2d": (1, h * h, h * h),
        "v512": (1, h * h, 512),
    }
    results = []

    # PARTS_FILTER=substr[,substr...]: run only matching parts (the slope
    # work is skipped, not just the print)
    _filters = [f for f in os.environ.get("PARTS_FILTER", "").split(",") if f]

    def want(part):
        return not _filters or any(f in part for f in _filters)

    def rec(part, ms, chain):
        if not want(part):
            return
        if callable(ms):
            ms = ms()
        results.append({"part": part, "ms": round(ms, 3),
                        "dtype": dtype_arg, "chain": chain})
        print(json.dumps(results[-1]), flush=True)

    def slope(mk_prog, n_variants_shapes):
        """(t_2K - t_K)/K over jitted K-step scan programs."""
        variants = [tuple(vs) for vs in zip(
            *[mk(s, reps + 1) for s in n_variants_shapes])]
        tK = _time_call(jax.jit(mk_prog(K)), variants, reps, sync)
        t2K = _time_call(jax.jit(mk_prog(2 * K)), variants, reps, sync)
        del variants
        return (t2K - tK) / K

    def perturb(tree, c):
        # cast back to the leaf dtype: c is an f32 loop carry, and bf16 * f32
        # promotes to f32 — which crashes raw lax convs (operand dtype
        # mismatch) and silently upgrades every bf16 param-perturb part to
        # f32 compute. The data dependency on c survives the cast.
        return jax.tree.map(
            lambda t: (t * (1 + c * 1e-12)).astype(t.dtype)
            if jnp.issubdtype(t.dtype, jnp.floating) else t, tree)

    def param_chain(fn, params):
        """Chain by perturbing params (free); fn(params, *arrays) -> pytree."""
        def mk_prog(steps):
            def prog(*arrays):
                def body(c, _):
                    out = fn(perturb(params, c), *arrays)
                    s = jax.tree.reduce(
                        lambda a, t: a + jnp.mean(t.astype(jnp.float32)),
                        out, jnp.float32(0))
                    return s, None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
                return c
            return prog
        return mk_prog

    def carry_chain(fn):
        """Chain by carrying the (same-shape) volume through fn + RMS renorm."""
        def mk_prog(steps):
            def prog(x0):
                def body(x, _):
                    out = fn(x)
                    out = out * jax.lax.rsqrt(
                        jnp.mean(jnp.square(out.astype(jnp.float32))) + 1e-20
                    ).astype(out.dtype)
                    return out, None
                xK, _ = jax.lax.scan(body, x0, None, length=steps)
                return jnp.sum(xK.astype(jnp.float32))
            return prog
        return mk_prog

    # ---- per-call transport floor, for the record (thunked like every
    # other part so PARTS_FILTER skips the measurement, not just the print)
    def _floor():
        s_vars = [(jax.device_put(jnp.float32(i)),) for i in range(reps + 1)]
        return _time_call(jax.jit(lambda x: x + 1), s_vars, reps, sync)
    rec("transport_roundtrip_floor", _floor, "per-call")

    # ---- correlation matmuls (perturb the small feature input)
    def corr_prog(shape_name):
        def mk_prog(steps):
            def prog(f):
                def body(c, _):
                    fc = f * (1 + c * 1e-12)
                    out = get_corr(fc, fc)
                    return jnp.mean(out.astype(jnp.float32)), None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
                return c
            return prog
        return mk_prog
    rec("corr_1024", lambda: slope(corr_prog("f1024"), [SHAPES["f1024"]]), "feat-perturb")
    rec("corr_2048", lambda: slope(corr_prog("f2048"), [SHAPES["f2048"]]), "feat-perturb")

    # ---- WeightAverage
    wa = WeightAverage()
    wa_vars = wa.init(key, jnp.zeros(SHAPES["f1024"], dt))
    rec("wa_1024", lambda: slope(param_chain(lambda p, x: wa.apply(p, x), wa_vars),
              [SHAPES["f1024"]]),
        "param-perturb")

    # ---- mutual matching (volume carried through; +renorm pass)
    rec("mm_vol10", lambda: slope(carry_chain(mutual_matching), [SHAPES["vol10"]]),
        "carry+renorm")

    def mm_vjp(x):
        out, vjp = jax.vjp(mutual_matching, x)
        (dx,) = vjp(out)
        return dx
    rec("mm_vjp_vol10", lambda: slope(carry_chain(mm_vjp), [SHAPES["vol10"]]),
        "carry+renorm")

    # ---- whole-volume plane swap (pure transpose, carried)
    rec("swap_vol10", lambda: slope(carry_chain(lambda x: x.transpose(0, 3, 4, 1, 2, 5)),
              [SHAPES["vol10"]]),
        "carry")

    # ---- pivot convs (param-perturbed)
    piv_a = CenterPivotConv4d(out_channels=10)
    pa_vars = piv_a.init(key, jnp.zeros(SHAPES["vol2"], dt))
    rec("pivot_2to10", lambda: slope(param_chain(lambda p, x: piv_a.apply(p, x), pa_vars),
              [SHAPES["vol2"]]),
        "param-perturb")

    piv_b = CenterPivotConv4d(out_channels=10)
    pb_vars = piv_b.init(key, jnp.zeros(SHAPES["vol10"], dt))
    rec("pivot_10to10", lambda: slope(param_chain(lambda p, x: piv_b.apply(p, x), pb_vars),
              [SHAPES["vol10"]]),
        "param-perturb")

    # ---- rank-4-route pivots + mutual matching: the SHIPPED layout (the
    # 6D parts above time the fallback route). These are the addends of the
    # rank-4 step decomposition: a symmetric 3-block stack's forward is
    # 2 x (r4_pivot_2to10 + r4_pivot_10to10 + r4_pivot_10to1) around the
    # two mm_bqsc passes (BENCH.md round 5).
    from few_shot_seg_cwt_tpu.ops.corr import mutual_matching_bqsc

    S4 = h * h
    dims4 = (h, h, h, h)

    def r4_pivot(ci, co, grad, swap=False):
        piv = CenterPivotConv4d(out_channels=co)
        pv = piv.init(key, jnp.zeros((1, S4, S4, ci), dt),
                      flat_dims=dims4, bqsc=True)

        def fwd(p, x):
            return piv.apply(p, x, swap, False, dims4, True)

        if not grad:
            return param_chain(fwd, pv), pv

        def g(p, x):
            def loss(pp, xx):
                return jnp.mean(jnp.square(fwd(pp, xx).astype(jnp.float32)))
            return jax.grad(loss, argnums=(0, 1))(p, x)

        return param_chain(g, pv), pv

    for ci, co, nm in [(2, 10, "2to10"), (10, 10, "10to10"), (10, 1, "10to1")]:
        rec(f"r4_pivot_{nm}_fwd",
            lambda ci=ci, co=co: slope(r4_pivot(ci, co, False)[0],
                                       [(1, S4, S4, ci)]),
            "param-perturb")
        rec(f"r4_pivot_{nm}_grad",
            lambda ci=ci, co=co: slope(r4_pivot(ci, co, True)[0],
                                       [(1, S4, S4, ci)]),
            "param-perturb")
    # the swapped-role block of the symmetric stack (exchanged kernels)
    rec("r4_pivot_10to10_swap_fwd",
        lambda: slope(r4_pivot(10, 10, False, swap=True)[0], [(1, S4, S4, 10)]),
        "param-perturb")

    rec("mm_bqsc_vol10", lambda: slope(carry_chain(mutual_matching_bqsc),
                                       [(1, S4, S4, 10)]),
        "carry+renorm")

    def mm_bqsc_vjp(x):
        out, vjp = jax.vjp(mutual_matching_bqsc, x)
        (dx,) = vjp(out)
        return dx
    rec("mm_bqsc_vjp_vol10", lambda: slope(carry_chain(mm_bqsc_vjp),
                                           [(1, S4, S4, 10)]),
        "carry+renorm")

    # ---- query-plane conv layout A/B (BENCH.md round 5): the rank-4 route pays two
    # whole-volume (0,2,1,3) permutations per pivot to batch the query-plane
    # conv as NHWC. The HWNC candidate instead feeds XLA a conv whose BATCH
    # dim is the support axis in place (dimension_numbers ("HWNC","HWIO",
    # "HWNC") on the free (hq,wq,sn,C) view of the same bytes) — zero
    # transposes IF XLA:TPU lowers it natively rather than re-transposing.
    S = h * h
    qk = jax.random.normal(jax.random.PRNGKey(7), (3, 3, 10, 10), dt) * 0.1

    def q_tr(k, x):  # today's route: transpose -> NHWC conv -> transpose back
        xt = x.transpose(0, 2, 1, 3).reshape(S, h, h, 10)
        dn = jax.lax.conv_dimension_numbers(
            xt.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        o = jax.lax.conv_general_dilated(
            xt, k, (1, 1), [(1, 1)] * 2, dimension_numbers=dn)
        return o.reshape(1, S, S, 10).transpose(0, 2, 1, 3)

    def q_hwnc(k, x):  # candidate: batch-on-dim-2 conv, no transposes
        xr = x.reshape(h, h, S, 10)
        dn = jax.lax.conv_dimension_numbers(
            xr.shape, k.shape, ("HWNC", "HWIO", "HWNC"))
        o = jax.lax.conv_general_dilated(
            xr, k, (1, 1), [(1, 1)] * 2, dimension_numbers=dn)
        return o.reshape(1, S, S, 10)

    def s_nhwc(k, x):  # the s-plane conv (free reshape), as the floor
        xr = x.reshape(S, h, h, 10)
        dn = jax.lax.conv_dimension_numbers(
            xr.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        o = jax.lax.conv_general_dilated(
            xr, k, (1, 1), [(1, 1)] * 2, dimension_numbers=dn)
        return o.reshape(1, S, S, 10)

    def kx_grad(fn):
        def gg(k, x):
            def loss(kk, xx):
                return jnp.mean(jnp.square(fn(kk, xx).astype(jnp.float32)))
            return jax.grad(loss, argnums=(0, 1))(k, x)
        return gg

    for label, fn in [("splane_nhwc", s_nhwc), ("qplane_tr", q_tr),
                      ("qplane_hwnc", q_hwnc)]:
        # bind fn explicitly: rec() happens to call the thunk synchronously,
        # but a deferred/batched rec must not silently measure the last fn
        rec(f"{label}_fwd",
            lambda fn=fn: slope(param_chain(fn, qk), [(1, S, S, 10)]),
            "param-perturb")
        rec(f"{label}_grad",
            lambda fn=fn: slope(param_chain(kx_grad(fn), qk), [(1, S, S, 10)]),
            "param-perturb")

    # ---- the full match pipeline (mm -> symmetric consensus -> mm), through
    # whichever route is active (rank-4 default; FSS_NCONS_R4=0 for 6D)
    from few_shot_seg_cwt_tpu.models.matching import MatchNet, ncons_r4_active

    net = MatchNet(temp=3.0, cv_type="red", in_channel=2,
                   block_remat=not ncons_r4_active("red"))
    corr_cm = jnp.zeros((1, 2, h * h, h * h), dt)
    net_vars = net.init(key, corr_cm, (h, h, h, h),
                        method=net.run_match_model_flat)
    route = "r4" if ncons_r4_active("red") else "6d"
    rec(f"match_pipeline_fwd[{route}]", lambda: slope(param_chain(
            lambda p, x: net.apply(p, x, (h, h, h, h),
                                   method=net.run_match_model_flat),
            net_vars),
            [(1, 2, h * h, h * h)]),
        "param-perturb")

    def mp_loss(params, x):
        out = net.apply(params, x, (h, h, h, h),
                        method=net.run_match_model_flat)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))
    rec(f"match_pipeline_grad[{route}]", lambda: slope(param_chain(
            lambda p, x: jax.grad(mp_loss)(p, x), net_vars),
            [(1, 2, h * h, h * h)]),
        "param-perturb")

    # ---- CHM head parts (reference src/model/match.py:191-244 pipeline at
    # the 473px protocol: 60px features halved to 30 -> 6D scale volume
    # (1,3,3,30,30,30,30) -> CHM6d (true-4D conv, 9->9 folded scale channels)
    # -> sigmoid -> scale max-pool -> interpolate4d to 60 -> CHM4d (1-channel
    # true-4D conv) -> softplus -> mutual NN -> readout). The conv parts time
    # few_shot_seg_cwt_tpu.models.conv4d.conv4d (custom VJP) at exactly the
    # CHM kernel/volume shapes; the glue part times everything between the
    # two convs; mutual_nn times the (1,3600,3600) filter.
    from few_shot_seg_cwt_tpu.models.chm import interpolate4d
    from few_shot_seg_cwt_tpu.models.conv4d import conv4d as _conv4d_op
    from few_shot_seg_cwt_tpu.ops.corr import mutual_nn_filter

    hh = h // 2                      # 30 at the protocol
    k6 = jax.random.normal(jax.random.PRNGKey(11), (5, 5, 5, 5, 9, 9), dt) * 0.02
    k4 = jax.random.normal(jax.random.PRNGKey(12), (5, 5, 5, 5, 1, 1), dt) * 0.02

    def chm_conv(kern, x):
        return _conv4d_op(x, kern)

    def chm_conv_grad(kern, x):
        def loss(kk, xx):
            return jnp.mean(jnp.square(chm_conv(kk, xx).astype(jnp.float32)))
        return jax.grad(loss, argnums=(0, 1))(kern, x)

    rec("chm6d_conv_fwd",
        lambda: slope(param_chain(chm_conv, k6), [(1, hh, hh, hh, hh, 9)]),
        "param-perturb")
    rec("chm6d_conv_grad",
        lambda: slope(param_chain(chm_conv_grad, k6), [(1, hh, hh, hh, hh, 9)]),
        "param-perturb")
    rec("chm4d_conv_fwd",
        lambda: slope(param_chain(chm_conv, k4), [(1, h, h, h, h, 1)]),
        "param-perturb")
    rec("chm4d_conv_grad",
        lambda: slope(param_chain(chm_conv_grad, k4), [(1, h, h, h, h, 1)]),
        "param-perturb")

    def chm_glue(x):
        # the exact between-convs pipeline: sigmoid -> scale max-pool ->
        # interpolate4d to 60 (CHMLearner, models/chm.py)
        y = jax.nn.sigmoid(x)
        y = y.reshape(1, 9, hh, hh, hh, hh).max(axis=1)
        return interpolate4d(y, h)                    # (1, 60, 60, 60, 60)

    def glue_prog(grad):
        def mk_prog(steps):
            def prog(x):
                def body(c, _):
                    xc = x * (1 + c * 1e-12)
                    if grad:
                        out, vjp = jax.vjp(chm_glue, xc)
                        (dx,) = vjp(out)
                        s = jnp.mean(dx.astype(jnp.float32))
                    else:
                        s = jnp.mean(chm_glue(xc).astype(jnp.float32))
                    return s, None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
                return c
            return prog
        return mk_prog

    rec("chm_glue", lambda: slope(glue_prog(False),
                                  [(1, 3, 3, hh, hh, hh, hh)]),
        "input-perturb")
    rec("chm_glue_vjp", lambda: slope(glue_prog(True),
                                      [(1, 3, 3, hh, hh, hh, hh)]),
        "input-perturb")

    rec("chm_mutual_nn", lambda: slope(carry_chain(
            lambda x: mutual_nn_filter(jax.nn.softplus(x))),
            [SHAPES["corr2d"]]),
        "carry+renorm")

    # ---- attention readout (perturb the value matrix)
    def ro_prog(steps):
        def prog(c2d, v):
            def body(c, _):
                out = masked_attention_readout(c2d, v * (1 + c * 1e-12),
                                               temp=20.0)
                return jnp.mean(out), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
            return c
        return prog
    rec("readout", lambda: slope(ro_prog, [SHAPES["corr2d"], SHAPES["v512"]]),
        "v-perturb")

    def ro_vjp_prog(steps):
        def prog(c2d, v):
            def body(c, _):
                def f(c2, vv):
                    return jnp.mean(masked_attention_readout(
                        c2, vv * (1 + c * 1e-12), temp=20.0))
                out, grads = jax.value_and_grad(f, argnums=(0, 1))(c2d, v)
                return out + jnp.mean(grads[0].astype(jnp.float32)), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
            return c
        return prog
    rec("readout_vjp", lambda: slope(ro_vjp_prog, [SHAPES["corr2d"], SHAPES["v512"]]),
        "v-perturb")


if __name__ == "__main__":
    main()
