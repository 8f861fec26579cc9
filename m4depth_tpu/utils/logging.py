"""Scalar/image logging: JSONL metrics stream + optional TensorBoard export.

Parity reference: the TensorBoard scalar/image summaries of the reference
train step (m4depth_network.py:401-427, main.py:86-89). Core logging is
dependency-free JSONL; TensorBoard export is attempted lazily and skipped if
tensorflow is unavailable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: Optional[str], use_tensorboard: bool = True):
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if use_tensorboard:
                try:
                    import tensorflow as tf  # CPU-only; optional

                    self._tb = tf.summary.create_file_writer(log_dir)
                except Exception:
                    self._tb = None

    def log_scalars(self, step: int, scalars: Dict[str, float],
                    prefix: str = "") -> None:
        record = {"step": step, "time": time.time()}
        record.update({prefix + k: float(v) for k, v in scalars.items()})
        if self._jsonl:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(prefix + k, float(v), step=step)
                self._tb.flush()

    def log_images(self, step: int, images: Dict[str, "object"]) -> None:
        """images: name -> [h, w, c] float array in [0, 1]."""
        if self._tb is not None:
            import numpy as np
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in images.items():
                    arr = np.asarray(v)[None]
                    tf.summary.image(k, arr, step=step)
                self._tb.flush()
        elif self.log_dir:
            try:
                import cv2
                import numpy as np

                img_dir = os.path.join(self.log_dir, "images")
                os.makedirs(img_dir, exist_ok=True)
                for k, v in images.items():
                    arr = (np.clip(np.asarray(v), 0, 1) * 255).astype("uint8")
                    if arr.shape[-1] == 3:
                        arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
                    cv2.imwrite(
                        os.path.join(img_dir, f"{k}_{step:08d}.png"), arr)
            except Exception:
                pass

    def close(self):
        if self._jsonl:
            self._jsonl.close()
