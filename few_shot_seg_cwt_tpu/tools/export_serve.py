"""AOT export of the CWT serving program as a self-contained artifact.

``jax.export`` serializes the full episodic predictor — frozen backbone,
``adapt_iter`` inner-loop classifier adaptation, CWT weight transform,
align-corners upsample, argmax — to portable StableHLO with **all weights
baked in as constants**. A serving host can then run episodes with nothing
but jax installed (no model code, no checkpoints):

    import jax.export, pathlib
    ex = jax.export.deserialize(pathlib.Path("cwt_serve.jaxexport").read_bytes())
    masks = ex.call(batch, rngs)        # (E, H, W) int32 query masks

where ``batch = {"s_img": (E, shot, H, W, 3) f32, "s_label": (E, shot, H, W)
i32, "q_img": (E, H, W, 3) f32}`` (normalized images, {0,1,255} support
masks) and ``rngs = jax.vmap(jax.random.PRNGKey)(seeds)`` seeds the
classifier init. This is the deployment form of the reference's inference
surface (src/test.py:103-254) minus the scoring.

CLI:

    python -m few_shot_seg_cwt_tpu.tools.export_serve \
        --config configs/pascal.yaml --out cwt_serve.jaxexport \
        [--batch 8] [--mesh N] [--head mmn --head-ckpt best.ckpt] \
        [--opts resume_weights best.pth ckpt_used best ...]

``--head {mmn|match|chm|detr|fuse}`` exports an EXTENSION-HEAD predictor
instead of the CWT one: frozen backbone -> inner loop -> head-refined query
feature -> blended prediction -> argmax (the validation-time prediction of
train_head, label-free; see HeadEngine.serve_episode for which heads have a
serving form). ``--head-ckpt`` points at the trainer's orbax best/final
ckpt (random init without it, for plumbing runs); the fuse head reads its
frozen MatchNet from cfg.matchnet_ckpt as at training time.

``--mesh N`` exports the program data-parallel over an N-device mesh
(episodes sharded on the batch axis, weights replicated); the artifact then
requires exactly N devices at serving time.

Weights resolve exactly as in ``train.test`` (``resume_weights`` .pth /
directory schema, ``ckpt_used`` transformer ckpt, random-init fallback for
plumbing runs). The artifact is lowered for the platform the exporting host
runs (``jax.default_backend()``): export on the TPU host to capture the
VMEM-resident Pallas inner loop; a CPU export uses the XLA-scan fallback and
runs anywhere.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp


def build_serve_export(cfg, vars_b, vars_t, batch: int, mesh=None):
    """Close the serve program over concrete weights and export it.

    With ``mesh`` (a 1-axis ``jax.sharding.Mesh``), the exported program is
    data-parallel over the mesh's devices: the episode/rng batch axes carry
    ``NamedSharding(P("data"))``, weights replicate, and the artifact records
    the device count — the serving host calls it with inputs sharded the same
    way and each chip predicts its shard's episodes (the serving analog of
    parallel.mesh's training DP)."""
    import jax.export

    from ..episodic.engine import EpisodicEngine

    engine = EpisodicEngine(cfg)

    def serve(episodes, rngs):
        return jax.vmap(engine.serve_episode, in_axes=(None, None, 0, 0))(
            vars_b, vars_t, episodes, rngs
        )

    size = int(cfg.image_size)
    shot = int(cfg.shot)
    specs = {
        "s_img": jax.ShapeDtypeStruct((batch, shot, size, size, 3), jnp.float32),
        "s_label": jax.ShapeDtypeStruct((batch, shot, size, size), jnp.int32),
        "q_img": jax.ShapeDtypeStruct((batch, size, size, 3), jnp.float32),
    }
    rng_spec = jax.ShapeDtypeStruct((batch, 2), jnp.uint32)
    if mesh is None:
        fn = jax.jit(serve)
    else:
        from ..parallel.mesh import data_sharding

        n = mesh.size
        if batch % n:
            raise ValueError(f"--batch {batch} must be divisible by mesh size {n}")
        fn = jax.jit(
            serve,
            in_shardings=(
                {k: data_sharding(mesh, v.ndim) for k, v in specs.items()},
                data_sharding(mesh, 2),
            ),
            out_shardings=data_sharding(mesh, 3),
        )
    return jax.export.export(fn)(specs, rng_spec)


def build_head_serve_export(cfg, head_type: str, vars_b, trainables,
                            frozen_vars, batch: int, mesh=None):
    """Export an extension head's label-free predictor (HeadEngine.serve_episode)."""
    import jax.export

    from ..episodic.heads import HeadEngine

    engine = HeadEngine(cfg, head_type)

    def serve(episodes, rngs):
        # lax.map, not vmap: an episode batch dim over the rank-4 consensus
        # route yields rank-5 transposes with catastrophically padded TPU
        # layouts (HeadEngine.eval_metrics_batch has the numbers). Under
        # --mesh this local map runs inside shard_map, so chips still
        # predict their episode shards in parallel.
        return jax.lax.map(
            lambda er: engine.serve_episode(vars_b, trainables, er[0], er[1],
                                            frozen_vars),
            (episodes, rngs))

    size = int(cfg.image_size)
    shot = int(cfg.shot)
    specs = {
        "s_img": jax.ShapeDtypeStruct((batch, shot, size, size, 3), jnp.float32),
        "s_label": jax.ShapeDtypeStruct((batch, shot, size, size), jnp.int32),
        "q_img": jax.ShapeDtypeStruct((batch, size, size, 3), jnp.float32),
    }
    rng_spec = jax.ShapeDtypeStruct((batch, 2), jnp.uint32)
    if mesh is None:
        fn = jax.jit(serve)
    else:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import data_sharding

        n = mesh.size
        if batch % n:
            raise ValueError(f"--batch {batch} must be divisible by mesh size {n}")
        # shard_map (not bare jit): each chip runs the LOCAL lax.map over
        # its episode shard — true data parallelism with the per-episode
        # program intact (a global lax.map over a sharded axis would run
        # sequentially with per-step collectives)
        local = shard_map(
            serve, mesh=mesh,
            in_specs=({k: P("data") for k in specs}, P("data")),
            out_specs=P("data"), check_rep=False)
        fn = jax.jit(
            local,
            in_shardings=(
                {k: data_sharding(mesh, v.ndim) for k, v in specs.items()},
                data_sharding(mesh, 2),
            ),
            out_shardings=data_sharding(mesh, 3),
        )
    return jax.export.export(fn)(specs, rng_spec)


def _load_head_weights(cfg, head_type: str, head_ckpt):
    """Backbone per the test-entry rules + head trainables (orbax or random)."""
    import numpy as np

    from ..episodic.heads import HeadEngine
    from ..train.test import load_backbone_weights
    from ..train.train_head import init_head_trainables

    engine = HeadEngine(cfg, head_type)
    vars_b = load_backbone_weights(cfg, engine)
    trainables = init_head_trainables(cfg, engine, vars_b)
    if head_ckpt:
        from ..utils.ckpt import load_ckpt

        # train_head saves best/final as the BARE trainables tree
        # (train_head.py save_ckpt calls) — restore with the same structure
        trainables = load_ckpt(str(head_ckpt),
                               like=jax.tree.map(np.asarray, trainables))
        print(f"=> loaded head trainables '{head_ckpt}'")
    frozen_vars = None
    if head_type == "fuse":
        from ..train.train_head import init_frozen_match

        frozen_vars = init_frozen_match(cfg, engine)
    return vars_b, trainables, frozen_vars


def export_to_file(cfg, out_path: str, batch: int, mesh_devices: int = 0,
                   head: str | None = None, head_ckpt: str | None = None) -> dict:
    """Load eval weights per the test-entry rules, export, write the blob."""
    from ..episodic.engine import EpisodicEngine
    from ..train.test import load_eval_weights

    mesh = None
    if mesh_devices:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh([mesh_devices])
    if head:
        vars_b, trainables, frozen_vars = _load_head_weights(cfg, head, head_ckpt)
        exported = build_head_serve_export(
            cfg, head, vars_b, trainables, frozen_vars, batch, mesh=mesh)
    else:
        engine = EpisodicEngine(cfg)
        vars_b, vars_t = load_eval_weights(cfg, engine)
        exported = build_serve_export(cfg, vars_b, vars_t, batch, mesh=mesh)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    info = {
        "path": os.path.abspath(out_path),
        "bytes": len(blob),
        "platforms": list(exported.platforms),
        "batch": batch,
        "shot": int(cfg.shot),
        "image_size": int(cfg.image_size),
        "devices": exported.nr_devices,
        "head": head or "cwt",
    }
    return info


def main(argv=None) -> dict:
    from ..config import load_cfg, merge_cfg_from_list

    p = argparse.ArgumentParser(description="Export the CWT serving program")
    p.add_argument("--config", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=8,
                   help="episodes per serving call (static)")
    p.add_argument("--mesh", type=int, default=0,
                   help="export data-parallel over this many devices "
                        "(0 = single-device artifact)")
    p.add_argument("--head", default=None,
                   help="export this extension head's predictor instead of "
                        "the CWT one (mmn|match|chm|detr|fuse)")
    p.add_argument("--head-ckpt", default=None,
                   help="orbax ckpt of the head trainables (train_head's "
                        "best/final); random init if omitted")
    p.add_argument("--opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args(argv)

    if args.head_ckpt and not args.head:
        p.error("--head-ckpt requires --head (otherwise the CWT predictor "
                "would be exported and the head checkpoint silently ignored)")
    cfg = load_cfg(args.config)
    if args.opts:
        cfg = merge_cfg_from_list(cfg, args.opts)
    info = export_to_file(cfg, args.out, args.batch, mesh_devices=args.mesh,
                          head=args.head, head_ckpt=args.head_ckpt)
    print(info)
    return info


if __name__ == "__main__":
    main()
