"""Metrics/observability: TensorBoard-compatible writer + JSONL log.

The reference logs per-step prints and TensorBoard scalars/embeddings/text
(reference model/cvig_fov.py:388,467-479,569-575). This writer emits
TensorBoard events via tensorboardX or torch.utils.tensorboard (whichever
imports; a warning is printed when neither does, never a silent no-op) and
always appends a JSONL stream (machine-readable observability the reference
lacks, SURVEY.md §5.5).
"""

from __future__ import annotations

import json
import os
import time
import warnings
from typing import Optional


def _summary_writer(logdir: str):
    try:
        from tensorboardX import SummaryWriter  # type: ignore

        return SummaryWriter(logdir)
    except Exception:
        pass
    try:
        from torch.utils.tensorboard import SummaryWriter  # type: ignore

        return SummaryWriter(logdir)
    except Exception:
        warnings.warn(
            "Neither tensorboardX nor torch.utils.tensorboard is available; "
            "TensorBoard event files will NOT be written (JSONL metrics only).",
            stacklevel=3,
        )
        return None


class MetricWriter:
    def __init__(self, logdir: str, jsonl: bool = True):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._tb = _summary_writer(logdir)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a") if jsonl else None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        if self._jsonl is not None:
            self._jsonl.write(
                json.dumps({"t": time.time(), "tag": tag, "value": float(value), "step": step})
                + "\n"
            )

    def text(self, tag: str, value: str, step: int = 0) -> None:
        if self._tb is not None:
            self._tb.add_text(tag, value, step)
        if self._jsonl is not None:
            self._jsonl.write(
                json.dumps({"t": time.time(), "tag": tag, "text": value, "step": step}) + "\n"
            )

    def embedding(self, tag: str, vectors, label_imgs=None, step: int = 0) -> None:
        """TensorBoard projector dump of embedding vectors with optional label
        images (reference cvig_fov.py:475-479 dumps val-set surface embeddings
        with their photos as thumbnails).

        vectors: [N, D] array-like. label_imgs: [N, H, W, C] float images in
        [0, 1] (NHWC; converted to the NCHW the projector expects) or None.
        """
        import numpy as np

        vectors = np.asarray(vectors)
        if self._tb is not None:
            label_img = None
            if label_imgs is not None:
                # the projector's thumbnail path goes through torch's
                # make_grid; on a torch-less install dump vectors only
                # instead of killing the training loop
                try:
                    import torch

                    arr = np.asarray(label_imgs, np.float32)
                    label_img = torch.tensor(np.transpose(arr, (0, 3, 1, 2)))
                except Exception as err:  # broken installs raise OSError
                    # etc. from `import torch`, not just ImportError — none
                    # of them may kill the training loop
                    warnings.warn(
                        "torch unavailable: projector embedding written "
                        f"without label images ({type(err).__name__})",
                        stacklevel=2,
                    )
            self._tb.add_embedding(
                vectors, label_img=label_img, tag=tag, global_step=step
            )
        if self._jsonl is not None:
            self._jsonl.write(
                json.dumps(
                    {
                        "t": time.time(),
                        "tag": tag,
                        "embedding_shape": list(vectors.shape),
                        "step": step,
                    }
                )
                + "\n"
            )

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        if self._jsonl is not None:
            self._jsonl.flush()

    def close(self) -> None:
        self.flush()
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
