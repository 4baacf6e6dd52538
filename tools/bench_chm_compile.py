"""Compile-time probe: which CHM component stalls the 473px train compile.

Times jit-compile (fwd + grad) of CHM6d at (1,3,3,60,60,60,60) and CHM4d at
(1,120,120,120,120,1) in isolation. Usage:
  python -m tools.bench_chm_compile [chm6d|chm4d|both] [fwd|grad|both]
"""
import os
import sys
import time

import numpy as np


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    what = sys.argv[2] if len(sys.argv) > 2 else "both"
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from few_shot_seg_cwt_tpu.models.chm import CHM4d, CHM6d

    def probe(name, mod, shape):
        x = jnp.zeros(shape, jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), x)
        if what in ("fwd", "both"):
            t0 = time.time()
            jax.jit(lambda v, x: mod.apply(v, x)).lower(variables, x).compile()
            print(f"{name} fwd compile: {time.time()-t0:.1f}s", flush=True)
        if what in ("grad", "both"):
            def loss(v, x):
                return jnp.sum(mod.apply(v, x).astype(jnp.float32))
            t0 = time.time()
            jax.jit(jax.grad(loss, argnums=(0, 1))).lower(variables, x).compile()
            print(f"{name} grad compile: {time.time()-t0:.1f}s", flush=True)

    if which in ("chm6d", "both"):
        probe("chm6d@60^4x9", CHM6d(ksz6d=3, ksz4d=5, ktype="psi"),
              (1, 3, 3, 60, 60, 60, 60))
    if which in ("chm4d", "both"):
        probe("chm4d@120^4", CHM4d(ksz=5, ktype="psi"),
              (1, 120, 120, 120, 120, 1))


if __name__ == "__main__" and os.environ.get("CHM_PROBE_GRADS") != "1":
    main()


def probe_conv4d_grads():
    """Isolate dx vs dkernel compile cost of the raw conv4d at 120^4."""
    import jax
    import jax.numpy as jnp

    from few_shot_seg_cwt_tpu.models.conv4d import conv4d

    x = jnp.zeros((1, 120, 120, 120, 120, 1), jnp.float32)
    k = jnp.zeros((5, 5, 5, 5, 1, 1), jnp.float32)

    def loss(x, k):
        return jnp.sum(conv4d(x, k))

    for name, argnums in (("dx", 0), ("dk", 1)):
        t0 = time.time()
        jax.jit(jax.grad(loss, argnums=argnums)).lower(x, k).compile()
        print(f"conv4d@120^4 grad[{name}] compile: {time.time()-t0:.1f}s",
              flush=True)


if __name__ == "__main__" and os.environ.get("CHM_PROBE_GRADS") == "1":
    probe_conv4d_grads()


def probe_conv2d_kgrad():
    """Compile time of ONE 2D kernel-grad at the CHM4d-slice shape."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((14400, 120, 120, 1), jnp.float32)  # (B*H*W, HS, WS, Ci)
    k = jnp.zeros((5, 5, 1, 1), jnp.float32)

    def loss(k):
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jax.lax.conv_general_dilated(
            x, k, (1, 1), [(2, 2), (2, 2)], dimension_numbers=dn))

    t0 = time.time()
    jax.jit(jax.grad(loss)).lower(k).compile()
    print(f"conv2d kernel-grad @(14400,120,120,1) compile: "
          f"{time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__" and os.environ.get("CHM_PROBE_K2") == "1":
    probe_conv2d_kgrad()


def probe_kgrad_shapes():
    """Kernel-grad compile time vs batch size / rank."""
    import jax
    import jax.numpy as jnp

    def kg(name, shape, kshape, window):
        x = jnp.zeros(shape, jnp.float32)
        k = jnp.zeros(kshape, jnp.float32)
        dims = ("NHWC", "HWIO", "NHWC") if len(shape) == 4 else \
               ("NHWDC", "HWDIO", "NHWDC")
        pad = [(w // 2,) * 2 for w in window]

        def loss(k):
            dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, dims)
            return jnp.sum(jax.lax.conv_general_dilated(
                x, k, (1,) * len(window), pad, dimension_numbers=dn))

        t0 = time.time()
        jax.jit(jax.grad(loss)).lower(k).compile()
        print(f"kgrad {name}: {time.time()-t0:.1f}s", flush=True)

    kg("3d b=1 (120^3)", (1, 120, 120, 120, 1), (5, 5, 5, 1, 1), (5, 5, 5))
    kg("2d b=120 (120^2)", (120, 120, 120, 1), (5, 5, 1, 1), (5, 5))
    kg("2d b=14400 c=9", (14400, 60, 60, 9), (5, 5, 9, 9), (5, 5))


if __name__ == "__main__" and os.environ.get("CHM_PROBE_SHAPES") == "1":
    probe_kgrad_shapes()
