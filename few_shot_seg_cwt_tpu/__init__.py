"""few_shot_seg_cwt_tpu: TPU-native few-shot semantic segmentation (CWT and extensions).

A from-scratch JAX/XLA/pjit re-design of the capabilities of the reference
PyTorch repo TeamOfProfGuo/Few_Shot_Seg_CWT ("Simpler is Better: Few-shot
Semantic Segmentation with Classifier Weight Transformer", ICCV 2021, plus
research extensions). The compute path is jit-compiled end to end:

* the per-episode classifier adaptation (reference: 200 Python-level SGD steps,
  src/train.py:222-231) is a fused ``jax.lax.scan`` vmapped over episode batches;
* the CWT cross-attention (src/model/transformer.py:33-83) is a batched einsum
  attention over the 3600-pixel query feature map;
* evaluation metrics are on-device scatter-add IoU accumulators;
* scale-out is a ``jax.sharding.Mesh`` with episodes sharded on the data axis
  (replacing the reference's single-node NCCL DDP, src/train_ddp.py).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("FSS_PLATFORM"):
    # Escape hatch for hosts whose sitecustomize pins JAX_PLATFORMS (the
    # axon tunnel does): plain env vars cannot override that hook, so
    # FSS_PLATFORM=cpu routes a CLI run off-chip via jax.config — e.g. a
    # synthetic-data smoke run that must not contend with a benchmark
    # owning the single-tenant chip. Read at import, before any jax use.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["FSS_PLATFORM"])
