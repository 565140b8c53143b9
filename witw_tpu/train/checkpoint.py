"""Checkpoint save/restore with best-pointer and resume.

The reference only ever saves two raw state_dicts on a new best validation
loss, with no optimizer state and no resume (reference
model/cvig_fov.py:481-487; SURVEY.md §5.4). Here the full TrainState
(params + batch stats + optimizer state + step) is serialized, with:

- ``step_<N>`` periodic checkpoints (bounded retention),
- a ``best`` checkpoint updated on new best validation loss (preserving the
  reference's contract),
- ``latest``/``best`` pointer files enabling exact resume.

Serialization uses flax msgpack (flax.serialization) — single-file,
dependency-stable, written atomically (tmp + rename). Multi-host safety: on a
pod every process runs this code, so writes are gated on
``jax.process_index() == 0`` (non-zero processes fetch nothing and write
nothing); leaves that are not fully addressable on this host are gathered
with ``process_allgather`` before serialization.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(x) -> np.ndarray:
    """Fetch one state leaf to host numpy, gathering shards living on other
    processes' devices when needed (np.asarray alone cannot read those)."""
    if (
        jax.process_count() > 1
        and isinstance(x, jax.Array)
        and not x.is_fully_addressable
    ):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


class Checkpointer:
    def __init__(self, directory: str, keep: int = 3, async_saves: bool = False):
        """``async_saves`` serializes + writes step/latest checkpoints on a
        single background thread (the device->host fetch stays synchronous so
        the saved state is a consistent snapshot); training overlaps the disk
        write. ``wait()`` joins pending writes; best/final saves always
        complete before returning from the public helpers that need them."""
        self.directory = directory
        self.keep = keep
        self.async_saves = async_saves
        self._executor = None
        self._pending = []
        if jax.process_index() == 0:
            os.makedirs(directory, exist_ok=True)

    def _writer(self):
        import concurrent.futures as futures

        if self._executor is None:
            self._executor = futures.ThreadPoolExecutor(1)
        return self._executor

    def wait(self) -> None:
        """Block until every queued async write has finished."""
        for f in self._pending:
            f.result()
        self._pending = []

    # ---- low-level ----

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, f"{name}.msgpack")

    def save(self, name: str, state: Any, meta: Optional[dict] = None,
             block: bool = True) -> Optional[str]:
        """Write ``name``; only process 0 writes (returns None elsewhere).
        ``block=False`` (with async_saves) queues serialization + write on
        the background thread after a synchronous host fetch.

        Collective ordering: when any leaf is not fully addressable, the
        host fetch involves a process_allgather that EVERY process must
        enter — non-zero processes participate in the gather and only then
        return, otherwise process 0 would block in the collective forever.
        """
        needs_collective = jax.process_count() > 1 and any(
            isinstance(x, jax.Array) and not x.is_fully_addressable
            for x in jax.tree.leaves(state)
        )
        if jax.process_index() != 0 and not needs_collective:
            return None
        host_state = jax.tree.map(_to_host, state)  # consistent snapshot
        if jax.process_index() != 0:
            return None
        path = self._path(name)

        def write():
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(serialization.to_bytes(host_state))
            os.replace(tmp, path)
            if meta is not None:
                with open(os.path.join(self.directory, f"{name}.json"), "w") as f:
                    json.dump(meta, f)
            return path

        if self.async_saves and not block:
            # prune completed writes, but KEEP errored futures so wait()
            # (and the next restore) re-raises the failure instead of
            # silently losing checkpoints
            self._pending = [
                f for f in self._pending
                if not f.done() or f.exception() is not None
            ]
            self._pending.append(self._writer().submit(write))
            return path
        return write()

    def restore(self, name: str, target: Any) -> Any:
        self.wait()  # a restore right after an async save must see it
        with open(self._path(name), "rb") as f:
            return serialization.from_bytes(target, f.read())

    def meta(self, name: str) -> Optional[dict]:
        p = os.path.join(self.directory, f"{name}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def exists(self, name: str) -> bool:
        self.wait()
        return os.path.exists(self._path(name))

    # ---- training protocol ----

    def save_step(self, state: Any, step: int, meta: Optional[dict] = None) -> None:
        meta = dict(meta or {}, step=step)
        self.save(f"step_{step}", state, meta, block=False)
        self.save("latest", state, meta, block=False)
        if self.async_saves:
            if jax.process_index() == 0:
                self._pending.append(self._writer().submit(self._gc))
        else:
            self._gc()

    def save_best(self, state: Any, val_loss: float, step: int) -> None:
        """New best validation loss (reference contract, cvig_fov.py:481-487)."""
        self.save("best", state, {"val_loss": val_loss, "step": step})

    def best_val_loss(self) -> Optional[float]:
        m = self.meta("best")
        return None if m is None else m.get("val_loss")

    def restore_latest(self, target: Any) -> Optional[Any]:
        """Resume point. Multi-process: only process 0 is guaranteed to SEE
        the checkpoint (it is the only writer — per-host local directories
        are a supported layout), so whether a checkpoint exists and its
        contents are both broadcast from process 0; every process returns
        the same restored state (or None) and the epoch loops stay in sync."""
        if jax.process_count() <= 1:
            if not self.exists("latest"):
                return None
            return self.restore("latest", target)
        from jax.experimental import multihost_utils

        found = bool(
            multihost_utils.broadcast_one_to_all(
                np.asarray(
                    jax.process_index() == 0 and self.exists("latest"),
                    np.bool_,
                )
            )
        )
        if not found:
            return None
        # process 0 reads the file; everyone else contributes its (identical
        # tree-structure) init target so the broadcast can carry the values
        local = (
            self.restore("latest", target)
            if jax.process_index() == 0
            else target
        )
        return multihost_utils.broadcast_one_to_all(local)

    def _gc(self) -> None:
        if jax.process_index() != 0:
            return
        steps = sorted(
            int(f[5:-8])
            for f in os.listdir(self.directory)
            if f.startswith("step_") and f.endswith(".msgpack")
        )
        for s in steps[: -self.keep] if self.keep > 0 else []:
            for ext in (".msgpack", ".json"):
                p = os.path.join(self.directory, f"step_{s}{ext}")
                if os.path.exists(p):
                    os.remove(p)
