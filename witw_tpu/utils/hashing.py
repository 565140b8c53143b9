"""Content fingerprints for cache-staleness checks."""

from __future__ import annotations

import hashlib

import jax
import numpy as np


def params_fingerprint(params) -> str:
    """Order-stable sha256 over a parameter pytree (paths, shapes, dtypes and
    raw bytes). Used to fingerprint embedding caches against the weights that
    produced them (tools/heatmap.py): re-running a sweep after retraining
    with the same tile grid must not serve scores from the old checkpoint's
    embeddings (VERDICT r2 weak #4/#5)."""
    h = hashlib.sha256()
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        arr = np.asarray(leaf)
        h.update(str(path).encode())
        h.update(str(arr.shape).encode())
        h.update(str(arr.dtype).encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()
