"""TensorBoard scalar logging (reference parity: tensorboardX in pretrain).

Uses tf.summary when TensorFlow is importable; otherwise falls back to a
JSONL scalars file (`scalars.jsonl`) so metrics are always recoverable.
"""

from __future__ import annotations

import json
import os
from typing import Optional


class SummaryWriter:
    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._tf_writer = None
        try:
            import tensorflow as tf  # baked into the image

            self._tf_writer = tf.summary.create_file_writer(log_dir)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._tf_writer is not None:
            import tensorflow as tf

            with self._tf_writer.as_default():
                tf.summary.scalar(tag, float(value), step=int(step))
        else:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(step)}) + "\n")
            self._jsonl.flush()

    def flush(self) -> None:
        if self._tf_writer is not None:
            self._tf_writer.flush()

    def close(self) -> None:
        if self._tf_writer is not None:
            self._tf_writer.close()
        else:
            self._jsonl.close()
