"""Tee logging: stdout + append to a log file (reference: src/util.py:81-90)."""

from __future__ import annotations

import os
from typing import Optional

_log_path: Optional[str] = None


def log_to(path: Optional[str]) -> None:
    """Set (or clear) the directory that receives log.txt appends.

    Stored absolute so the tee survives a later working-directory change
    (the registered path outlives the trainer call that set it).
    """
    global _log_path
    _log_path = os.path.abspath(path) if path is not None else None
    if path is not None:
        os.makedirs(_log_path, exist_ok=True)


def get_logger():
    """Returns a print-like callable that also appends to <path>/log.txt.

    Multi-host: only process 0 prints/writes (the reference's rank-0
    ``main_process()`` gating, src/train_ddp.py:40-44); other processes get a
    no-op so trainers stay process-count-agnostic. The process check is
    deferred to call time: ``jax.process_index()`` initializes the XLA
    backend, which must not happen before the trainer's
    ``distributed_init``/``maybe_mesh`` call on multi-host runs.
    """

    def log(obj, filename: str = "log.txt"):
        import jax

        if jax.process_index() != 0:
            return
        print(obj, flush=True)
        if _log_path is not None:
            with open(os.path.join(_log_path, filename), "a") as f:
                print(obj, file=f)

    return log
