"""PyTorch checkpoint import: reference ``.pth`` state_dicts -> flax variables.

The reference ships stage-1 PSPNet weights and stage-2 transformer weights as
torch state_dicts, sometimes with a DDP ``module.`` prefix (reference:
src/train.py:57-75, convert_pth.py:1-17). This module remaps those names onto
this framework's flax parameter tree:

* conv kernels OIHW -> HWIO;
* BatchNorm weight/bias -> scale/bias (params) and running_mean/var ->
  mean/var (batch_stats);
* the deep-stem Sequential indices (layer0.{0,1,3,4,6,7}) -> conv1/bn1..;
* 1x1 classifier (K, C, 1, 1) -> (C, K) einsum weights;
* CWT transformer Linear weights (out, in) -> Dense kernels (in, out).

Checkpoint saving on our side uses orbax via ``save_ckpt``/``load_ckpt``.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Mapping, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def strip_module_prefix(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Remove the DDP 'module.' prefix (reference: convert_pth.py:11)."""
    return {re.sub(r"^module\.", "", k): v for k, v in state_dict.items()}


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = jnp.asarray(value)


def _conv_kernel(t) -> np.ndarray:
    return _np(t).transpose(2, 3, 1, 0)  # OIHW -> HWIO


_STEM_IDX = {"0": "conv1", "1": "bn1", "3": "conv2", "4": "bn2", "6": "conv3", "7": "bn3"}


def _bn(params: Dict, stats: Dict, flax_path: Tuple[str, ...], torch_prefix: str,
        sd: Mapping[str, Any]) -> None:
    _set(params, flax_path + ("scale",), _np(sd[torch_prefix + ".weight"]))
    _set(params, flax_path + ("bias",), _np(sd[torch_prefix + ".bias"]))
    _set(stats, flax_path + ("mean",), _np(sd[torch_prefix + ".running_mean"]))
    _set(stats, flax_path + ("var",), _np(sd[torch_prefix + ".running_var"]))


def import_pspnet(
    state_dict: Mapping[str, Any],
    arch: str = "resnet",
    skip_classifier: bool = False,
    skip_gamma: bool = False,
) -> Dict[str, Dict]:
    """Map a reference PSPNet state_dict to {'params': ..., 'batch_stats': ...}.

    Unknown keys (e.g. num_batches_tracked) are ignored. With
    ``skip_classifier``/``skip_gamma`` the corresponding entries are left out,
    mirroring the reference's stage-2 load filter (src/train.py:65-71).
    """
    sd = strip_module_prefix(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for key, val in sd.items():
        parts = key.split(".")
        if key.endswith("num_batches_tracked"):
            continue
        if parts[0] == "gamma":
            if not skip_gamma:
                _set(params, ("gamma",), _np(val))
            continue
        if parts[0] == "classifier":
            if skip_classifier:
                continue
            if parts[1] in ("weight", "weight_v"):
                name = "weight"
                w = _np(val)  # (K, C, 1, 1) or cos cls (K, C, 1, 1)
                _set(params, ("classifier", name), w[:, :, 0, 0].T)  # (C, K)
            elif parts[1] == "weight_g":
                _set(params, ("classifier", "weight_g"), _np(val).reshape(-1))
            elif parts[1] == "bias":
                _set(params, ("classifier", "bias"), _np(val))
            elif parts[1] == "cls":
                # CosCls wraps its conv in `.cls` (optionally WeightNorm'd)
                w = _np(val)
                if parts[-1] in ("weight", "weight_v"):
                    _set(params, ("classifier", "weight"), w[:, :, 0, 0].T)
                elif parts[-1] == "weight_g":
                    _set(params, ("classifier", "weight_g"), w.reshape(-1))
                elif parts[-1] == "bias":
                    _set(params, ("classifier", "bias"), w)
            elif parts[1] == "scale_factor":
                _set(params, ("classifier", "scale_factor"), _np(val))
            continue
        if parts[0] == "val_classifier":
            _set(params, ("val_classifier", "weight"), _np(val)[:, :, 0, 0].T)
            continue
        m_vgg = re.match(r"layer([0-4])$", parts[0]) if arch == "vgg" else None
        if m_vgg:
            # vgg stages: Sequential indices {0,3,6}=conv, {1,4,7}=bn
            stage = m_vgg.group(1)
            idx = int(parts[1])
            b = idx // 3
            if idx % 3 == 0:
                if parts[2] == "weight":
                    _set(params, ("trunk", f"stage{stage}_conv{b}", "kernel"), _conv_kernel(val))
                else:
                    _set(params, ("trunk", f"stage{stage}_conv{b}", "bias"), _np(val))
            else:
                _route_bn_leaf(params, stats, ("trunk", f"stage{stage}_bn{b}"), parts[2], val)
            continue
        if parts[0] == "layer0":
            name = _STEM_IDX[parts[1]]
            if name.startswith("conv"):
                _set(params, ("trunk", name, "kernel"), _conv_kernel(val))
            elif parts[2] == "weight":
                _set(params, ("trunk", name, "scale"), _np(val))
            elif parts[2] == "bias":
                _set(params, ("trunk", name, "bias"), _np(val))
            elif parts[2] == "running_mean":
                _set(stats, ("trunk", name, "mean"), _np(val))
            elif parts[2] == "running_var":
                _set(stats, ("trunk", name, "var"), _np(val))
            continue
        m = re.match(r"layer([1-4])$", parts[0])
        if m:
            block = f"layer{m.group(1)}_{parts[1]}"
            rest = parts[2:]
            if rest[0] == "downsample":
                sub = "downsample_conv" if rest[1] == "0" else "downsample_bn"
                if sub == "downsample_conv":
                    _set(params, ("trunk", block, sub, "kernel"), _conv_kernel(val))
                else:
                    _route_bn_leaf(params, stats, ("trunk", block, sub), rest[2], val)
            elif rest[0].startswith("conv"):
                _set(params, ("trunk", block, rest[0], "kernel"), _conv_kernel(val))
            elif rest[0].startswith("bn"):
                _route_bn_leaf(params, stats, ("trunk", block, rest[0]), rest[1], val)
            continue
        if parts[0] == "ppm":
            # ppm.features.<i>.<1|2>.<leaf>
            i = parts[2]
            if parts[3] == "1":
                _set(params, ("ppm", f"bin{i}_conv", "kernel"), _conv_kernel(val))
            else:
                _route_bn_leaf(params, stats, ("ppm", f"bin{i}_bn"), parts[4], val)
            continue
        if parts[0] == "bottleneck":
            if parts[1] == "0":
                _set(params, ("bottleneck_conv", "kernel"), _conv_kernel(val))
            elif parts[1] == "1":
                _route_bn_leaf(params, stats, ("bottleneck_bn",), parts[2], val)
            continue
        # silently ignore anything else (AMP scalers, optimizer stashes, ...)

    out: Dict[str, Dict] = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def _route_bn_leaf(params: Dict, stats: Dict, path: Tuple[str, ...], leaf: str, val) -> None:
    if leaf == "weight":
        _set(params, path + ("scale",), _np(val))
    elif leaf == "bias":
        _set(params, path + ("bias",), _np(val))
    elif leaf == "running_mean":
        _set(stats, path + ("mean",), _np(val))
    elif leaf == "running_var":
        _set(stats, path + ("var",), _np(val))


def import_pspnet_vgg(state_dict: Mapping[str, Any], **kw) -> Dict[str, Dict]:
    return import_pspnet(state_dict, arch="vgg", **kw)


def _import_conv2d(params: Dict, flax_path: Tuple[str, ...], torch_prefix: str,
                   sd: Mapping[str, Any]) -> None:
    _set(params, flax_path + ("kernel",), _conv_kernel(sd[torch_prefix + ".weight"]))
    if torch_prefix + ".bias" in sd:
        _set(params, flax_path + ("bias",), _np(sd[torch_prefix + ".bias"]))


def _import_matchnet_into(params: Dict, sd: Mapping[str, Any], src_prefix: str,
                          dst: Tuple[str, ...]) -> None:
    """Map a reference MatchNet subtree (NeighConsensus + optional SCE)."""
    for key in sd:
        if not key.startswith(src_prefix):
            continue
        rel = key[len(src_prefix):]
        parts = rel.split(".")
        if parts[0] == "NeighConsensus" and parts[1] == "conv":
            i = int(parts[2]) // 2  # Sequential interleaves ReLU
            if parts[3] in ("conv1", "conv2"):  # CenterPivotConv4d
                sub = "conv_query" if parts[3] == "conv1" else "conv_support"
                if parts[4] == "weight":
                    _set(params, dst + (f"conv4d_{i}", sub, "kernel"),
                         _conv_kernel(sd[key]))
                else:
                    _set(params, dst + (f"conv4d_{i}", sub, "bias"), _np(sd[key]))
            elif parts[3] == "weight":  # true Conv4d, pre-permuted (k0,O,I,k1,k2,k3)
                w = _np(sd[key]).transpose(0, 3, 4, 5, 2, 1)  # -> (k0,k1,k2,k3,I,O)
                _set(params, dst + (f"conv4d_{i}", "kernel"), w)
            elif parts[3] == "bias":
                _set(params, dst + (f"conv4d_{i}", "bias"), _np(sd[key]))
        elif parts[0] == "SpatialContextEncoder" and parts[1] == "embeddingFea":
            if parts[3] == "weight":
                _set(params, dst[:-1] + ("sce", "embed", "kernel"),
                     _conv_kernel(sd[key]))
            else:
                _set(params, dst[:-1] + ("sce", "embed", "bias"), _np(sd[key]))


def import_matchnet(state_dict: Mapping[str, Any]) -> Dict[str, Dict]:
    """Reference MatchNet state_dict -> flax MatchNet variables."""
    sd = strip_module_prefix(state_dict)
    params: Dict[str, Any] = {}
    _import_matchnet_into(params, sd, "", ("ncons",))
    return {"params": params}


def import_mmn(state_dict: Mapping[str, Any]) -> Dict[str, Dict]:
    """Reference MMN state_dict -> flax MMN variables."""
    sd = strip_module_prefix(state_dict)
    params: Dict[str, Any] = {}
    _import_matchnet_into(params, sd, "corr_net.", ("corr_net", "ncons"))
    for key in sd:
        parts = key.split(".")
        if parts[0].startswith("rd_") and parts[1] == "0":
            _import_conv2d(params, (parts[0],), ".".join(parts[:2]), sd)
        elif parts[0].startswith("wa_") and parts[1].startswith("conv_"):
            _import_conv2d(params, (parts[0], parts[1]), ".".join(parts[:2]), sd)
    return {"params": params}


def import_cwt(state_dict: Mapping[str, Any]) -> Dict[str, Dict]:
    """Map a reference MultiHeadAttentionOne state_dict to flax params."""
    sd = strip_module_prefix(state_dict)
    params: Dict[str, Any] = {}
    _set(params, ("w_qkvs", "kernel"), _np(sd["w_qkvs.weight"]).T)
    _set(params, ("fc", "kernel"), _np(sd["fc.weight"]).T)
    _set(params, ("fc", "bias"), _np(sd["fc.bias"]))
    _set(params, ("layer_norm", "scale"), _np(sd["layer_norm.weight"]))
    _set(params, ("layer_norm", "bias"), _np(sd["layer_norm.bias"]))
    return {"params": params}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a torch .pth and return its state_dict (handles {'state_dict': ...})."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        return blob["state_dict"]
    return blob


# ---------------------------------------------------------------------------
# Native checkpointing (orbax)
# ---------------------------------------------------------------------------

def save_ckpt(path: str, tree: Any) -> None:
    """Orbax save; multi-host-safe.

    EVERY process must call this: orbax's save is a collective (it barriers
    all hosts at save_start/commit), and orbax itself writes from the
    primary host only — that is the reference's rank-0 checkpoint gating
    (src/train_ddp.py:40-44,226-244). Gating the call on process 0 would
    deadlock process 0 at the barrier.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_ckpt(path: str, like: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, target=like)
    return ckptr.restore(path)


# ---------------------------------------------------------------------------
# Full resumable train state (reference: {'epoch','state_dict','optimizer'}
# checkpoints, src/train.py:141-163 / src/pretrain.py:148-160 — plus the rng
# key so a resumed run continues the exact step stream)
# ---------------------------------------------------------------------------

def pack_train_state(model: Any, opt_state: Any, rng: Any,
                     epoch: int, best: float, **extra_meta: float) -> Dict[str, Any]:
    import numpy as _np

    meta = {"epoch": _np.int32(epoch), "best": _np.float32(best)}
    for k, v in extra_meta.items():
        meta[k] = _np.float32(v)
    return {
        "model": model,
        "opt_state": opt_state,
        "rng": rng,
        "meta": meta,
    }


def is_full_train_state(path: str) -> bool:
    """Does this checkpoint carry optimizer state (vs model weights only)?"""
    try:
        raw = load_ckpt(path)
    except Exception:
        return False
    return isinstance(raw, dict) and "opt_state" in raw


def restore_train_state(path: str, like_state: Dict[str, Any]) -> Dict[str, Any]:
    """Typed restore of a pack_train_state checkpoint (optax namedtuples and
    the rng key come back with their real structures)."""
    import jax
    import numpy as _np

    like = jax.tree.map(_np.asarray, like_state)
    return load_ckpt(path, like=like)
