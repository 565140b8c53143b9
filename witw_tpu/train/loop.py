"""Epoch-based train/val loop and full-gallery test, reference-compatible.

Reproduces the reference driver semantics (reference model/cvig_fov.py:385-487):
epoch loop with train + val phases, per-step loss logging, running epoch
averages, and a best-checkpoint keyed on the validation loss. Differences
(deliberate, SURVEY.md §5):
- loss fetch is asynchronous (jax arrays are only synced for logging),
- checkpoints carry optimizer state and support exact resume,
- the val-phase loss is explicitly the checkpoint key (the reference reuses a
  loop variable so 'best' implicitly keys on whatever phase ran last — val).
"""

from __future__ import annotations

import time
from typing import Dict, Iterable, Optional

import jax
import numpy as np

from witw_tpu.configs.base import ExperimentConfig
from witw_tpu.evaluation.gallery import (
    FovGalleryEvaluator,
    euclidean_ranks,
    metrics_from_ranks,
)
from witw_tpu.parallel.mesh import shard_batch
from witw_tpu.train.checkpoint import Checkpointer
from witw_tpu.train.metrics import MetricWriter
from witw_tpu.train.pipeline import BaselinePipeline, FovPipeline, TrainState


def device_prefetch(loader: Iterable, mesh=None, depth: int = 2):
    """Move batches to device ``depth`` iterations ahead of consumption so
    host->device transfer overlaps the previous step's compute (jax transfers
    are async; the arrays materialize while the prior step runs).

    Yields (data, n_valid): {'surface', 'overhead'[, 'valid']} device arrays
    sharded over ``mesh`` if given, and the number of real rows. A straggler
    batch not divisible by the data axis is zero-PADDED to the next multiple
    and sharded like every other batch (no unsharded step, no odd-size
    compile); the bool 'valid' mask marks real rows, the jitted losses
    restrict pair sums to valid x valid (match/losses.py), and train-mode
    BatchNorm statistics exclude padded rows (models/baseline.py) — the
    unpadded batch's loss up to f32 reduction-order rounding."""
    import collections

    import jax.numpy as jnp

    from witw_tpu.parallel.mesh import DATA_AXIS

    buf = collections.deque()
    for batch in loader:
        data = {k: v for k, v in batch.items() if k in ("surface", "overhead")}
        n = len(next(iter(data.values())))
        if mesh is not None:
            n_dev = mesh.shape[DATA_AXIS]
            if n % n_dev:
                pad = n_dev - n % n_dev
                data = {
                    k: np.pad(np.asarray(v), [(0, pad)] + [(0, 0)] * (np.ndim(v) - 1))
                    for k, v in data.items()
                }
                data["valid"] = np.arange(n + pad) < n
            data = shard_batch(data, mesh)
        else:
            data = jax.tree.map(jnp.asarray, data)
        buf.append((data, n))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def run_phase(
    pipeline,
    state: TrainState,
    loader: Iterable,
    rng: jax.Array,
    train: bool,
    epoch: int,
    writer: Optional[MetricWriter] = None,
    log_every: int = 1,
    mesh=None,
    verbose: bool = True,
    checkpointer: Optional[Checkpointer] = None,
    save_every_steps: int = 0,
) -> tuple:
    """One pass over a loader; returns (state, avg_loss, count).
    ``save_every_steps`` > 0 writes mid-epoch step checkpoints (train phase)."""
    from witw_tpu.utils.profiling import StepTimer

    phase = "train" if train else "val"
    running_loss = 0.0
    running_count = 0
    losses = []
    timer = None
    # TensorBoard x-axis is the GLOBAL step epoch*len(loader)+batch like the
    # reference (cvig_fov.py:469-471) — a bare per-epoch batch index would
    # collide across epochs and zigzag the chart.
    try:
        step_base = epoch * len(loader)
    except TypeError:
        step_base = 0

    def drain(loss_val, c, bi, tail: bool):
        nonlocal running_loss, running_count
        loss_f = float(loss_val)
        running_loss += loss_f * c
        running_count += c
        if verbose and (tail or bi % log_every == 0):
            print(
                f"epoch = {epoch + 1} {phase}, iter = {bi}, "
                f"count = {running_count}, loss = {loss_f:.4f}"
            )
        if writer is not None:
            writer.scalar(f"{phase} loss", running_loss / running_count,
                          step_base + bi)

    for batch_i, (batch, count) in enumerate(device_prefetch(loader, mesh)):
        if timer is None:
            timer = StepTimer(items_per_step=count)
        timer.tick()
        rng, step_rng = jax.random.split(rng)
        if train:
            state, metrics = pipeline.train_step(state, batch, step_rng)
            if (
                checkpointer is not None
                and save_every_steps > 0
                and (batch_i + 1) % save_every_steps == 0
            ):
                checkpointer.save_step(state, int(state.step), {"epoch": epoch})
        else:
            metrics = pipeline.eval_step(state, batch, step_rng)
        losses.append((metrics["loss"], count, batch_i))
        # Drain the async loss queue with one step of lag so logging never
        # blocks the device.
        while len(losses) > 1:
            drain(*losses.pop(0), tail=False)
    for entry in losses:
        # same logging contract for the final (lagged) batch — verbose tail
        # always prints like before, but the writer must see it too or every
        # epoch's loss stream is missing its last point
        drain(*entry, tail=True)
    avg = running_loss / max(running_count, 1)
    if timer is not None and writer is not None:
        stats = timer.summary()
        if stats.get("steps"):
            writer.scalar(f"{phase} pairs_per_sec", stats["items_per_sec"], epoch)
            writer.scalar(f"{phase} step_time_p50_s", stats["step_time_p50_s"], epoch)
    if verbose:
        extra = ""
        if timer is not None and timer.summary().get("steps"):
            extra = f" ({timer.items_per_sec:.1f} pairs/s)"
        print(f"  {phase:>5}: avg loss = {avg:f}{extra}")
    return state, avg, running_count


def train(
    cfg: ExperimentConfig,
    pipeline,
    train_loader,
    val_loader,
    num_epochs: Optional[int] = None,
    mesh=None,
    checkpointer: Optional[Checkpointer] = None,
    writer: Optional[MetricWriter] = None,
    verbose: bool = True,
    handle_signals: bool = False,
) -> TrainState:
    """``handle_signals=True`` installs a SIGTERM/SIGINT handler that finishes
    the current phase, checkpoints, and returns — preemption-safe training the
    reference has no story for (SURVEY.md §5.3; a crash there loses the
    epoch)."""
    # Install signal handlers before any compile/restore work so an early
    # preemption is still caught.
    interrupted = {"flag": False}
    old_handlers = {}
    if handle_signals:
        import signal

        def on_signal(signum, frame):
            interrupted["flag"] = True
            if verbose:
                print(f"signal {signum}: checkpointing at next phase boundary")

        for sig in (signal.SIGTERM, signal.SIGINT):
            old_handlers[sig] = signal.signal(sig, on_signal)

    rng = jax.random.PRNGKey(cfg.train.seed)
    rng, init_rng = jax.random.split(rng)
    state = pipeline.init(init_rng)

    if checkpointer is None:
        checkpointer = Checkpointer(cfg.train.checkpoint_dir, keep=cfg.train.keep_checkpoints)
    restored = checkpointer.restore_latest(state)
    start_epoch = 0
    if restored is not None:
        state = restored
        meta = checkpointer.meta("latest") or {}
        start_epoch = int(meta.get("epoch", 0))
        if verbose:
            print(f"resumed from step {int(state.step)} (epoch {start_epoch})")

    try:
        best_loss = checkpointer.best_val_loss()
        if jax.process_count() > 1:
            # Only process 0 is guaranteed to see the checkpoint files (it is
            # the only writer): epoch/best-loss metadata must be process-0's
            # view everywhere, or the epoch loops desync and a divergent
            # "new best" decision deadlocks save()'s allgather.
            from jax.experimental import multihost_utils

            start_epoch, best_loss = (
                multihost_utils.broadcast_one_to_all(
                    (np.asarray(start_epoch, np.int32),
                     np.asarray(np.inf if best_loss is None else best_loss,
                                np.float64))
                )
            )
            start_epoch = int(start_epoch)
            best_loss = None if not np.isfinite(best_loss) else float(best_loss)
        epochs = num_epochs if num_epochs is not None else cfg.train.num_epochs
        for epoch in range(start_epoch, epochs):
            if verbose:
                print(f"Epoch {epoch + 1}, {time.ctime()}")
            # Per-epoch keys are FOLDED from the epoch number, not drawn from
            # a sequential stream: a resumed run at epoch k must see epoch
            # k's augmentation rngs, not replay epoch 0's (a sequential
            # split-per-epoch stream restarts from the base seed after
            # restore, and also shifts with writer-dependent extra splits).
            epoch_rng = jax.random.fold_in(rng, epoch)
            tr_rng, val_rng, dump_rng = jax.random.split(epoch_rng, 3)
            state, _, _ = run_phase(
                pipeline, state, train_loader, tr_rng, True, epoch,
                writer, cfg.train.log_every_steps, mesh, verbose,
                checkpointer=checkpointer,
                save_every_steps=cfg.train.save_every_steps,
            )
            if interrupted["flag"]:
                checkpointer.save_step(state, int(state.step), {"epoch": epoch})
                if verbose:
                    print("interrupted: state checkpointed (epoch incomplete)")
                return state
            _, val_loss, _ = run_phase(
                pipeline, state, val_loader, val_rng, False, epoch,
                writer, cfg.train.log_every_steps, mesh, verbose,
            )
            if writer is not None:
                dump_val_embeddings(pipeline, state, val_loader, writer, epoch, dump_rng)
            checkpointer.save_step(state, int(state.step), {"epoch": epoch + 1})
            if best_loss is None or val_loss < best_loss:
                if verbose:
                    print("-------> new best")
                best_loss = val_loss
                checkpointer.save_best(state, val_loss, int(state.step))
                if writer is not None:
                    writer.text(
                        "best_loss", f"new best loss: {best_loss}, epoch: {epoch + 1}"
                    )
            if interrupted["flag"]:
                return state
        return state
    finally:
        if handle_signals:
            import signal

            for sig, handler in old_handlers.items():
                signal.signal(sig, handler)


def _fetch_global(x) -> np.ndarray:
    """Fetch a device array to host numpy, gathering across processes when the
    array is sharded over a multi-host mesh (np.asarray alone cannot read
    remote shards). Fully-addressable arrays are fetched directly — an
    allgather there would concatenate each process's identical copy."""
    from witw_tpu.train.checkpoint import _to_host

    return _to_host(x)


def embed_all(pipeline, state: TrainState, loader, mesh=None, rng=None, verbose=False):
    """Embed a whole dataset; returns (surface_embeds, overhead_embeds) —
    device arrays when single-process without a mesh (see below), else
    numpy. Batch results are accumulated in a list and concatenated ONCE —
    O(N) total copies, vs the reference's per-batch torch.cat realloc pattern
    which is O(N^2) (cvig_fov.py:527-532). Multi-host meshes are handled by a
    per-batch process_allgather. ``rng`` seeds the eval-time stochastic
    transforms the reference applies (random crop heading / synced rotation),
    split per batch."""
    import jax.numpy as jnp

    if rng is None:
        rng = jax.random.PRNGKey(0)
    # Single-process, single-device: keep the embeddings ON DEVICE — the
    # evaluators consume device arrays directly (jnp.asarray is a no-op), so
    # fetching here only to re-upload for the rank sweep would round-trip
    # ~100 MB-class arrays through the host (the dominant eval cost through
    # the axon tunnel; exp/r4_eval_roofline). Meshes/multi-host still gather
    # to host numpy (process_allgather + straggler semantics need it).
    on_device = mesh is None and jax.process_count() == 1
    surfaces = []
    overheads = []
    for data, n_valid in device_prefetch(loader, mesh):
        rng, step_rng = jax.random.split(rng)
        s_emb, o_emb = pipeline.embed_step(state, data, step_rng)
        if on_device:
            surfaces.append(s_emb[:n_valid])
            overheads.append(o_emb[:n_valid])
            continue
        # padded straggler rows (sharded path) are dropped after the fetch
        surfaces.append(_fetch_global(s_emb)[:n_valid])
        overheads.append(_fetch_global(o_emb)[:n_valid])
    if on_device:
        return jnp.concatenate(surfaces), jnp.concatenate(overheads)
    return np.concatenate(surfaces), np.concatenate(overheads)


def dump_val_embeddings(pipeline, state: TrainState, val_loader, writer: MetricWriter,
                        epoch: int, rng: jax.Array) -> None:
    """TensorBoard projector dump after the val phase (reference
    cvig_fov.py:475-479): one val batch's surface embeddings plus each
    overhead map's orientation-aligned crop for its own query, with the
    denormalized network inputs as thumbnails (surface width-padded to the
    polar map's width, reference :477). The reference dumps whatever batch
    the loop variable last held; here the FIRST val batch is used so the
    dump does not re-decode the whole validation set a second time per
    epoch."""
    if not isinstance(pipeline, FovPipeline):
        return  # the reference dumps embeddings only in the FOV/semantic scripts
    import jax.numpy as jnp

    from witw_tpu.match.distance import paired_chord_distance
    from witw_tpu.match.reference_impl import crop_overhead_materialized
    from witw_tpu.ops.image import denormalize_images

    batch = next(iter(val_loader), None)
    if batch is None:
        return
    data = {k: jnp.asarray(v) for k, v in batch.items() if k in ("surface", "overhead")}
    surface, polar = pipeline._preprocess(data, rng, train=False)
    s_emb = pipeline.surface_model.apply({"params": state.params["surface"]}, surface)
    o_emb = pipeline.overhead_model.apply({"params": state.params["overhead"]}, polar)
    _, orient = paired_chord_distance(o_emb, s_emb)
    sw = s_emb.shape[2]
    o_crop = crop_overhead_materialized(o_emb, orient[:, None], sw)[:, 0]
    b = s_emb.shape[0]
    vectors = np.concatenate(
        [np.asarray(s_emb).reshape(b, -1), np.asarray(o_crop).reshape(b, -1)]
    )
    d = pipeline.cfg.data
    # denormalize_images inverts the standardization only -> [0, 1] images
    # (matching reference inverse_normalize, cvig_fov.py:151-154)
    s_img = np.asarray(denormalize_images(surface, d.img_mean, d.img_std))
    p_img = np.asarray(denormalize_images(polar, d.img_mean, d.img_std))
    pad_w = p_img.shape[2] - s_img.shape[2]
    if pad_w > 0:
        s_img = np.pad(s_img, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
    label_imgs = np.clip(np.concatenate([s_img, p_img]), 0.0, 1.0)
    # the projector requires square thumbnails (tensorflow/tensorboard#670)
    h, w = label_imgs.shape[1:3]
    if h != w:
        side = max(h, w)
        label_imgs = np.pad(
            label_imgs, ((0, 0), (0, side - h), (0, side - w), (0, 0))
        )
    writer.embedding(
        "val_embedding", vectors, label_imgs[..., :3], step=epoch + 1
    )


def test(
    cfg: ExperimentConfig,
    pipeline,
    test_loader,
    state: Optional[TrainState] = None,
    mesh=None,
    checkpointer: Optional[Checkpointer] = None,
    writer: Optional[MetricWriter] = None,
    verbose: bool = True,
) -> Dict[str, float]:
    """Full-gallery retrieval eval (reference test(), cvig_fov.py:490-575)."""
    if state is None:
        if checkpointer is None:
            checkpointer = Checkpointer(cfg.train.checkpoint_dir)
        target = pipeline.init(jax.random.PRNGKey(0))
        state = checkpointer.restore("best", target)

    # The reference baseline applies the random SyncedRotation at eval time
    # too (cvig_baseline.py:410-414); we reproduce it with a fixed seed.
    rng = jax.random.PRNGKey(cfg.train.seed + 1)
    s_emb, o_emb = embed_all(pipeline, state, test_loader, mesh, rng)

    if isinstance(pipeline, FovPipeline):
        if cfg.eval.shard_gallery and mesh is None:
            import warnings

            warnings.warn(
                "shard_gallery requested but no device mesh is available "
                "(single device, or the eval batch size does not divide the "
                "device count) — falling back to the single-device gallery "
                "sweep", stacklevel=2,
            )
        evaluator = FovGalleryEvaluator(
            mesh=mesh,
            query_block=cfg.eval.query_block,
            gallery_chunk=cfg.eval.gallery_chunk,
            shard_gallery=cfg.eval.shard_gallery and mesh is not None,
            fast_matmul=cfg.eval.fast_matmul,
        )
        ranks = evaluator.ranks(o_emb, s_emb)
    else:
        # Baseline/SAFA families: gallery-resident mesh-sharded GEMM sweep
        # (bitwise equal to the single-device form; evaluation/gallery.py).
        ranks = euclidean_ranks(o_emb, s_emb, mesh=mesh)
    results = metrics_from_ranks(ranks)

    if verbose:
        print("Top  1: {:.2f}%".format(results["top_1"]))
        print("Top  5: {:.2f}%".format(results["top_5"]))
        print("Top 10: {:.2f}%".format(results["top_10"]))
        print("Top 1%: {:.2f}%".format(results["top_percent"]))
        print("Avg. Rank: {:.2f}".format(results["avg_rank"]))
        print("Med. Rank: {:.2f}".format(results["med_rank"]))
        print("Locations: {}".format(results["locations"]))
    if writer is not None:
        for key, val in results.items():
            writer.text(key, f"{key}: {val}")
    return results
