"""Shared trainer plumbing: seeds, datasets, weight loading, mesh setup."""

from __future__ import annotations

import os
import random
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.episodic import EpisodicDataset, StandardDataset
from ..data.loader import EpisodeLoader
from ..data.synthetic import SyntheticEpisodicDataset
from ..parallel.mesh import distributed_init, make_mesh
from ..utils.ckpt import import_pspnet, load_torch_checkpoint
from ..utils.dirs import get_model_dir_trans


def set_seeds(cfg) -> None:
    if cfg.manual_seed is not None:
        random.seed(cfg.manual_seed)
        np.random.seed(cfg.manual_seed)


def apply_debug(cfg) -> None:
    """Shrink runs in debug mode (reference: src/train.py:295-299)."""
    if cfg.debug:
        cfg.test_num = min(cfg.test_num, 500)
        cfg.epochs = min(cfg.epochs, 2)
        cfg.n_runs = min(cfg.n_runs, 2)
        cfg.save_models = False


def maybe_auto_resume(cfg, sv_path: str) -> None:
    """``auto_resume``: pick up this run's own ``train_state.ckpt`` when one
    exists, so a preempted job restarted with the identical command continues
    mid-training without operator intervention (the reference's recovery
    story is a manual restart from best.pth, SURVEY §5.3/4)."""
    if cfg.get("auto_resume") and not cfg.get("resume_ckpt"):
        cand = os.path.join(sv_path, "train_state.ckpt")
        if os.path.exists(cand):
            cfg.resume_ckpt = os.path.abspath(cand)
            print(f"=> auto_resume: found {cfg.resume_ckpt}")


def maybe_mesh(cfg):
    """Build a data mesh when >1 device is usable for the episode batch.

    The data axis must divide the episode batch; uses the largest such
    device count (e.g. batch 2 on 8 devices -> 2-device mesh).

    Multi-host: ``distributed_init`` (cfg-gated) runs first, so
    ``jax.devices()`` is the *global* device set and the same data axis spans
    slices over DCN (the reference's DDP analog, src/train_ddp.py:358-366).
    Loaders stay host-local (see ``episodic_loaders``); shard_batch assembles
    global arrays from the per-process slices.
    """
    distributed_init(cfg)
    if cfg.get("mesh_shape"):
        return make_mesh(cfg.mesh_shape, tuple(cfg.get("mesh_axes", ["data"])))
    n_dev = len(jax.devices())
    e = int(cfg.episode_batch)
    if jax.process_count() > 1:
        # multi-host: a mesh over a device SUBSET would leave some hosts
        # owning zero mesh devices and break the global-array assembly —
        # the mesh must span every process's chips
        assert e % n_dev == 0, (
            f"multi-host runs need episode_batch ({e}) divisible by the "
            f"global device count ({n_dev})"
        )
        return make_mesh([n_dev], ("data",))
    n = 0
    for d in range(min(n_dev, e), 0, -1):
        if e % d == 0:
            n = d
            break
    if n <= 1:
        return None
    return make_mesh([n], ("data",))


def episodic_dataset(cfg, train: bool):
    if not train and cfg.get("replay"):
        # replay a recorded reference episode stream (tools/record_episodes)
        from ..data.replay import ReplayEpisodicDataset

        return ReplayEpisodicDataset(cfg, str(cfg.replay))
    if cfg.get("synthetic_data"):
        n = cfg.iter_per_epoch if train else cfg.test_num
        return SyntheticEpisodicDataset(cfg, length=max(n, 64),
                                        seed=(1 if train else 2))
    return EpisodicDataset(cfg, train=train)


def _local_batch(e: int) -> int:
    """Per-process share of a global batch size (must divide evenly)."""
    nproc = jax.process_count()
    if nproc > 1:
        assert e % nproc == 0, (
            f"global batch {e} must divide over {nproc} processes"
        )
        e //= nproc
    return e


def episodic_val_loader(cfg) -> EpisodeLoader:
    """Validation episode loader; multi-host-correct.

    Each process loads episode_batch/P episodes per step via a deterministic
    rank-strided index slice, so the global batch ``shard_batch`` assembles
    holds P DISTINCT episode slices (the DistributedSampler analog,
    reference src/dataset/dataset.py:57-68) — not P copies of slice 0.
    """
    if cfg.get("replay") and jax.process_count() > 1:
        # the rank-strided index stream pads every rank to the same length by
        # cyclic wrap (up to P-1 repeated indices per pass). Episodic samplers
        # re-randomize a repeated index, but replay is DETERMINISTIC: a wrap
        # duplicate would double-score a recorded episode and silently bias
        # the parity number — refuse instead of documenting it away.
        raise ValueError(
            "replay evaluation is single-process only: the multi-host "
            "rank-padded index stream would duplicate recorded episodes "
            f"(process_count={jax.process_count()}); run the parity replay "
            "on one process (single-host mesh DP is fine)")
    return EpisodeLoader(
        episodic_dataset(cfg, train=False),
        batch_size=_local_batch(int(cfg.episode_batch)),
        shuffle=False, num_workers=cfg.workers,
        rank=jax.process_index(), world=jax.process_count(),
    )


def episodic_loaders(cfg) -> Tuple[EpisodeLoader, EpisodeLoader]:
    """Train/val episode loaders; host-local batches on multi-host.

    With P processes each host builds episode_batch/P episodes per step; the
    train side decorrelates sampling with a per-process seed offset
    (reference per-rank seeds, src/train_ddp.py:59-66), the val side uses
    rank-strided deterministic coverage (see ``episodic_val_loader``).
    shard_batch then assembles the global batch from the per-process slices.
    """
    train_ds = episodic_dataset(cfg, train=True)
    e = _local_batch(int(cfg.episode_batch))
    seed = (cfg.manual_seed or 0) + jax.process_index()
    train_loader = EpisodeLoader(train_ds, batch_size=e, shuffle=True,
                                 num_workers=cfg.workers, seed=seed)
    return train_loader, episodic_val_loader(cfg)


def init_backbone(cfg, engine, rng: Optional[jax.Array] = None,
                  skip_classifier: bool = True):
    """Init backbone variables; overlay stage-1 torch weights if available.

    Resume path schema matches the reference (src/train.py:57-59):
    <resume_weights>/<train_name>/split=<s>/pspnet_<arch><layers>/best.pth.
    Stage-2 trainers skip the stage-1 classifier (reference filter,
    src/train.py:66); the CCA trainers keep it (their base rows).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.manual_seed or 0)
    probe = jnp.zeros((1, 33, 33, 3), jnp.float32)
    # probe/rng as jit ARGUMENTS so XLA can't constant-fold the init forward
    variables = jax.jit(
        lambda r, p: engine.backbone.init({"params": r}, p, train=False)
    )(rng, probe)
    variables = jax.tree.map(np.asarray, variables)  # host-side, mutable copy

    if cfg.resume_weights:
        # wt_file=1 resumes the secondary best checkpoint (src/train_aug.py:60-63)
        leaf = "best1.pth" if cfg.get("wt_file", 0) == 1 else "best.pth"
        fname = os.path.join(
            cfg.resume_weights, cfg.train_name,
            f"split={cfg.train_split}",
            f"pspnet_{cfg.arch}{cfg.layers}", leaf,
        )
        if os.path.isfile(fname):
            print(f"=> loading weight '{fname}'")
            sd = load_torch_checkpoint(fname)
            imported = import_pspnet(
                sd, arch=cfg.arch, skip_classifier=skip_classifier,
                skip_gamma=True,
            )
            variables = _overlay(variables, imported)
            print(f"=> loaded weight '{fname}'")
        else:
            print(f"=> no weight found at '{fname}'")
    return variables


def _overlay(base, overlay):
    """Deep-merge imported leaves into the initialized variable tree."""
    import copy

    out = copy.deepcopy(dict(base))

    def merge(dst, src, path=()):
        for k, v in src.items():
            if isinstance(v, dict):
                node = dst.setdefault(k, {})
                merge(node, v, path + (k,))
            else:
                if k in dst and np.shape(dst[k]) != np.shape(v):
                    raise ValueError(
                        f"shape mismatch at {'/'.join(path + (k,))}: "
                        f"{np.shape(dst[k])} vs {np.shape(v)}"
                    )
                dst[k] = v

    for coll, tree in overlay.items():
        merge(out.setdefault(coll, {}), tree)
    return out


def init_cwt(cfg, engine, rng: Optional[jax.Array] = None):
    rng = rng if rng is not None else jax.random.PRNGKey((cfg.manual_seed or 0) + 1)
    d = cfg.bottleneck_dim
    q = jnp.zeros((1, cfg.num_classes_tr, d), jnp.float32)
    k = jnp.zeros((1, 4, 4, d), jnp.float32)
    # pass operands as jit ARGUMENTS (not closure constants): closed-over
    # zeros become jaxpr constants and XLA constant-folds the init forward
    # at compile time — minutes per conv on the CPU backend
    return jax.jit(lambda r, q_, k_: engine.cwt.init(r, q_, k_, k_))(rng, q, k)


def trans_ckpt_dir(cfg) -> str:
    return get_model_dir_trans(cfg)
