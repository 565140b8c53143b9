"""Geolocalization serving daemon: HTTP endpoint over a prebuilt tile index.

The reference's only "serving" story is re-running the heatmap sweep script
per query (reference tools/heatmap/heatmap.py — re-embeds the whole tile
gallery every time). This daemon loads the FOV towers once, memory-maps a
prebuilt :class:`witw_tpu.evaluation.index.GalleryIndex` (built by
``tools/heatmap.py --index-cache`` or programmatically), and answers queries
at device speed:

    POST /geolocate?k=5[&candidates=256]   body: JPEG/PNG photo bytes
        -> {"results": [{"x", "y", "distance", "orientation_deg", "score"},
            ...]}  (top-k tile centers by orientation-aligned chord distance;
        ``candidates`` switches to the two-stage approximate search — a
        pooled-cosine prefilter followed by exact rerank of that many tiles,
        for 100k+ tile galleries)
    GET  /healthz            -> {"status": "ok", "gallery_size": N, ...}
    GET  /stats              -> request/dispatch/error counters, uptime,
        mean requests per device dispatch (micro-batching occupancy)

Run: ``python -m witw_tpu.tools.serve --index tiles.npz --weights ./weights
--tag fov_70_witw --fov 70 [--int8] [--max-batch 8] [--port 8000]``

``--family safa`` serves a VGG16+SAFA checkpoint against a
:class:`~witw_tpu.evaluation.vector_index.VectorIndex` (plain Euclidean on
unit embeddings; built by ``tools/heatmap.py --family safa --index-cache``).
Results then carry ``orientation_deg: null`` — the vector families have no
orientation axis. ``--int8`` works for both families (the SAFA trunk's
static-int8 path measured 1.35x f32 on v5e, BASELINE.md).

The retrieval kernel is the hoisted chunked top-k of GalleryIndex.search —
one compiled shape regardless of gallery size.

``--max-batch N`` enables request micro-batching: concurrent requests that
arrive within a short window are embedded and searched as ONE device
dispatch (a batch-1 embed leaves the MXU nearly idle). Image decode/resize
stays on the request threads (parallel host work); batches are padded to
power-of-two sizes so at most log2(N)+1 graph shapes ever compile. Two
things make batching actually pay (measured, NOTES.md round 3b): per-bucket
kernels are pre-compiled at startup (``warmup()``; first-hit compiles are
30s-class through a remote-compile tunnel), and ``--batch-workers >= 2``
lets group round trips pipeline — a single batcher serializes every group
behind the previous dispatch+fetch, which measured 6.5x SLOWER than
unbatched under the axon tunnel's high per-dispatch latency.
"""

from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time
import warnings
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


class _Pending:
    """One queued request awaiting a batched dispatch."""

    __slots__ = ("img", "k", "candidates", "done", "result", "error")

    def __init__(self, img, k: int, candidates: int):
        self.img = img
        self.k = k
        self.candidates = candidates
        self.done = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None


def _check_index_matches_towers(index, state, int8: bool) -> None:
    """Fail fast when the index was built at a different precision or by a
    different checkpoint than the serving towers. Indexes without the
    recorded keys (hand-built GalleryIndex objects) pass unchecked."""
    want = "int8" if int8 else "f32"
    got = index.meta.get("precision")
    if got is not None and str(got) != want:
        raise ValueError(
            f"index was built at precision {got!r} but the daemon would embed "
            f"queries at {want!r} — rebuild the index with "
            f"{'--int8' if int8 else 'no --int8'} (or pass "
            f"allow_mismatch=True / --allow-mismatch to score anyway)"
        )
    recorded = index.meta.get("params_sha")
    if recorded is not None:
        from witw_tpu.utils.hashing import params_fingerprint

        current = params_fingerprint(state.params["overhead"])
        if str(recorded) != current:
            raise ValueError(
                "index gallery embeddings were produced by a different "
                f"checkpoint (index params_sha {str(recorded)[:12]}..., "
                f"serving towers {current[:12]}...) — rebuild the index from "
                "this checkpoint (or pass allow_mismatch=True / "
                "--allow-mismatch to score anyway)"
            )


class GeolocateService:
    """Embed-query + top-k search against a resident gallery index.

    ``max_batch`` >= 2 enables micro-batching: a worker thread drains
    concurrent requests (up to ``max_batch``, waiting at most
    ``batch_window_ms`` after the first) and runs ONE embed + ONE search per
    group. Exact and approximate requests are grouped separately so each
    keeps its contract; within an approximate group the candidate pool is
    the group max (never smaller than any request asked for).

    ``family`` selects the tower/index pairing: ``"fov"`` (default) embeds
    with the FOV-DSM surface tower and searches a GalleryIndex (orientation-
    aligned FFT chord distance); ``"safa"`` embeds with the VGG16+SAFA
    surface tower and searches a VectorIndex (plain Euclidean on the unit
    embeddings — no orientation axis, so results carry
    ``orientation_deg: null``). Vector-family exact search is one GEMM per
    gallery chunk, so ``candidates`` requests are served exactly (the
    two-stage approximate path exists to dodge the FOV sweep's cost, which
    those families don't pay). ``"baseline"`` serves the 7-conv GeM towers
    (reference cvig_baseline.py) through the same VectorIndex contract: raw
    pixels (no ImageNet normalization — the encoder scales to [-1,1]
    internally), dataset-specific photo geometry (cli/common.host_geometry),
    and f/||f||^0.5 embeddings whose Euclidean distances are UNBOUNDED — so
    its ``score`` is exp(-distance) rather than the [0,2]-calibrated
    exp(10*(1-d)) (see _format). Baseline int8 measured only 1.03x f32
    (BASELINE.md per-family row), so --int8 with this family trades almost
    no latency for 4x memory; it remains available."""

    def __init__(self, index, cfg, state, int8: bool = False,
                 fast: bool = False, max_batch: int = 0,
                 batch_window_ms: float = 3.0, mesh=None,
                 allow_mismatch: bool = False, batch_workers: int = 2,
                 max_candidates: int = 65536, family: str = "fov"):
        import jax
        import jax.numpy as jnp

        from witw_tpu.ops.image import normalize_images
        from witw_tpu.train.pipeline import make_pipeline

        if family not in ("fov", "safa", "baseline"):
            raise ValueError(f"unsupported serving family {family!r}")
        self.family = family
        self._vector = family in ("safa", "baseline")
        self._baseline = family == "baseline"
        # the index type must match the family: scoring FOV feature maps as
        # flat vectors (or vice versa) would not fail loudly on its own
        if self._vector != (index.embeds.ndim == 2):
            raise ValueError(
                f"family {family!r} needs a "
                f"{'VectorIndex' if self._vector else 'GalleryIndex'} but the "
                f"index embeds are {index.embeds.ndim}-D — rebuild the index "
                f"with the matching --family"
            )
        self.index = index
        self.cfg = cfg
        d = cfg.data
        pipeline = make_pipeline(cfg)
        self._int8 = int8
        # The index records which precision and which checkpoint produced its
        # gallery embeddings (build_index / heatmap --index-cache stamp both).
        # Scoring queries from a different precision or a retrained tower
        # against it silently degrades ranking (the same mismatch
        # heatmap._cache_is_stale rebuilds caches to avoid) — refuse to start
        # unless explicitly overridden.
        if not allow_mismatch:
            _check_index_matches_towers(index, state, int8)
        # bf16 frequency product in the search kernels (opt-in approximation;
        # exact is the default — see match/fft_matcher._freq_product). Only
        # the FOV family's FFT sweep has a fast variant; the vector families'
        # single-GEMM search has no approximate path, so accepting the flag
        # there would silently compare two identical exact runs.
        if fast and self._vector:
            warnings.warn(
                f"--fast-eval has no effect for family {family!r}: the "
                "vector search path is a single exact GEMM (no bf16 "
                "frequency-product variant); running exact search",
                stacklevel=2,
            )
            fast = False
        self._fast = fast
        # Multi-device mesh: keep the gallery RESIDENT sharded across every
        # device (GalleryIndex.place_sharded) so index capacity scales with
        # mesh HBM; exact searches then take the shard_map top-k path.
        self._mesh = mesh if (mesh is not None and mesh.devices.size > 1) else None
        if self._mesh is not None:
            self.index.place_sharded(self._mesh)
        self._sq = None  # calibrated lazily on the FIRST real query image so
        self._sq_lock = threading.Lock()  # scales match actual traffic, not a probe

        # Baseline photo geometry is dataset-specific (witw 500x500 / cvusa
        # 224x1232 with on-device row repeat — cli/common.host_geometry;
        # reference cvig_baseline.py:216-221); the other families decode to
        # the FOV surface crop geometry.
        if self._baseline:
            from witw_tpu.cli.common import host_geometry

            self._surface_hw = host_geometry(cfg)[0]
        else:
            self._surface_hw = (d.surface_height, d.surface_width)
        batch_stats = getattr(state, "batch_stats", {})

        def embed_f32(params, x):
            if self._baseline:
                from witw_tpu.ops.image import repeat_rows

                if pipeline.repeat_surface_rows:
                    x = repeat_rows(x, 2)
                return pipeline.surface_model.apply(
                    {"params": params["surface"],
                     "batch_stats": batch_stats["surface"]},
                    x, train=False,
                )
            x = normalize_images(x, d.img_mean, d.img_std)
            return pipeline.surface_model.apply({"params": params["surface"]}, x)

        def embed_int8(params, x):
            from witw_tpu.models.quantize import (
                quantized_baseline_forward_static,
                quantized_fov_forward_static,
                quantized_safa_forward_static,
            )

            if self._baseline:
                from witw_tpu.ops.image import repeat_rows

                if pipeline.repeat_surface_rows:
                    x = repeat_rows(x, 2)
                return quantized_baseline_forward_static(self._sq, x)
            x = normalize_images(x, d.img_mean, d.img_std)
            if self._vector:
                sq, head = self._sq
                return quantized_safa_forward_static(sq, head, x, False)
            return quantized_fov_forward_static(self._sq, x, False)

        self._embed_f32 = jax.jit(embed_f32)
        self._embed_int8 = jax.jit(embed_int8)
        self._normalize = lambda x: normalize_images(x, d.img_mean, d.img_std)
        self._params = state.params
        self._batch_stats = batch_stats

        self.max_batch = int(max_batch)
        # upper bound on any request's approximate-search rerank pool: the
        # rerank gathers that many gallery items onto one device per query
        self.max_candidates = int(max_candidates)
        self.started_at = time.time()
        self.stats = {"requests": 0, "dispatches": 0, "errors": 0,
                      "exact_searches": 0, "approx_searches": 0}
        # stats are bumped from concurrent request threads when batching is
        # off; += is a read-modify-write and drops counts without a lock
        self._stats_lock = threading.Lock()
        self._lifecycle = threading.Lock()  # geolocate enqueue vs close()
        self._queue: Optional[queue.Queue] = None
        self._workers: list = []
        if self.max_batch >= 2:
            self._window = batch_window_ms / 1000.0
            self._queue = queue.Queue()
            # More than one batcher lets group dispatches PIPELINE: with a
            # single worker every group waits out the previous group's full
            # dispatch+fetch round trip (expensive through a remote tunnel),
            # while unbatched requests overlap freely on their own threads —
            # measured 6.5x slower than unbatched at workers=1 (NOTES.md
            # round 3b). Under load each worker still fills its group.
            self._workers = [
                threading.Thread(
                    target=self._batch_loop, daemon=True,
                    name=f"geolocate-batcher-{i}",
                )
                for i in range(max(1, int(batch_workers)))
            ]
            for t in self._workers:
                t.start()

    def _embed(self, params, x):
        if not self._int8:
            return self._embed_f32(params, x)
        with self._sq_lock:
            if self._sq is None:
                import numpy as np

                from witw_tpu.models.quantize import (
                    quantize_baseline_tower_static,
                    quantize_safa_tower_static,
                    quantize_tower_static,
                )

                if self._baseline:
                    # raw-pixel calibration (the encoder owns its scaling);
                    # folds eval-mode BN affines, so it needs batch_stats
                    self._sq = quantize_baseline_tower_static(
                        {"params": params["surface"],
                         "batch_stats": self._batch_stats["surface"]},
                        [np.asarray(x)],
                    )
                else:
                    quantize = (quantize_safa_tower_static if self._vector
                                else quantize_tower_static)
                    self._sq = quantize(
                        params["surface"], [np.asarray(self._normalize(x))],
                        False,
                    )
        return self._embed_int8(params, x)

    def _decode(self, image_bytes: bytes):
        import numpy as np
        from PIL import Image

        from witw_tpu.data.loader import resize_host

        img = np.asarray(Image.open(io.BytesIO(image_bytes)).convert("RGB"),
                         np.float32)
        return resize_host(img, *self._surface_hw)

    def geolocate(self, image_bytes: bytes, k: int = 5, candidates: int = 0):
        # Decode/resize on the request thread even when batching — host image
        # work parallelizes across request threads; only device dispatch is
        # funneled through the batcher.
        img = self._decode(image_bytes)
        k = max(1, min(int(k), len(self.index)))
        candidates = int(candidates)
        if self._mesh is not None and candidates <= 0:
            # sharded serving answers from per-shard top-k candidate lists;
            # k beyond the placed width must not silently fall back to a
            # single-device full-gallery search (the gallery was sharded
            # precisely because one device can't hold it). Approximate
            # requests (candidates > 0) never touch the sharded path, so
            # their k is not limited by the placed width.
            k = min(k, self.index._sharded["max_k"])
        req = _Pending(img, k, candidates)
        # inline when batching is off or the batcher was close()d — never
        # enqueue into a queue nobody drains. The lifecycle lock closes the
        # check-then-put race against close().
        with self._lifecycle:
            batching = self._queue is not None and bool(self._workers)
            if batching:
                self._queue.put(req)
        if not batching:
            self._run_group([req])
        else:
            req.done.wait()
        if req.error is not None:
            raise req.error
        return req.result

    def close(self) -> None:
        """Stop the batcher threads (idempotent; no-op without batching).
        In-flight requests finish; requests racing the shutdown are served
        inline by their own thread (see geolocate)."""
        with self._lifecycle:
            workers, self._workers = self._workers, []
            for _ in workers:
                self._queue.put(None)
        if not workers:
            return
        for worker in workers:
            worker.join(timeout=30)
        if any(w.is_alive() for w in workers):
            # a long dispatch is still draining the queue; it owns a
            # sentinel and will exit on it — don't race it for the queue
            return
        # serve anything that slipped in behind the sentinels (enqueued
        # before close() took the lock)
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if req is not None:
                self._run_group([req])

    def _k_bucket(self, k_max: int) -> int:
        """The k the search kernels actually compile for: clamped to the
        gallery (and the sharded placed width), rounded up to a power of two
        so client k variety maps onto at most log2(max) compiled shapes.
        ONE implementation shared by _run_group and warmup — hand-mirrored
        copies of this arithmetic drift."""
        cap = len(self.index)
        if self._mesh is not None:
            cap = min(cap, self.index._sharded["max_k"])
        kb = max(1, min(int(k_max), cap))
        return min(1 << (kb - 1).bit_length(), cap)

    def warmup(self, ks=(1, 5, 10)) -> None:
        """Pre-compile the embed + exact-search kernels for every power-of-two
        batch bucket up to max_batch (including the top PADDED bucket when
        max_batch is not itself a power of two), at each distinct k bucket of
        ``ks``, so the first client to hit a new shape doesn't stall on a
        device compile mid-request — measured 30s-class through a
        remote-compile tunnel. Drives the REAL group path (padding,
        bucketing, search) with zero images. Call BEFORE serving traffic;
        stats are restored afterwards (exception-safe) so /stats reflects
        only client traffic.

        With --int8 the embed compile is deferred anyway (activation scales
        calibrate on the first real query image, not on a zero probe), so
        only the search kernels warm there."""
        import numpy as np

        d = self.cfg.data
        img = np.zeros(self._surface_hw + (3,), np.float32)
        top = max(1, self.max_batch)
        top = 1 << (top - 1).bit_length()  # groups pad up to this bucket
        buckets, b = [], 1
        while b <= top:
            buckets.append(b)
            b *= 2
        k_buckets = sorted({self._k_bucket(k) for k in ks})
        with self._stats_lock:
            before = dict(self.stats)
        try:
            skip_embed = self._int8 and self._sq is None
            for b in buckets:
                for kb in k_buckets:
                    if skip_embed:
                        # warm only the search kernels with a dummy embedding
                        # (embedding at calibration-time scales would pin the
                        # int8 scales to zeros)
                        if self._vector:
                            emb = np.zeros(
                                (b, self.index.embeds.shape[1]), np.float32)
                            if self._mesh is not None:
                                self.index.search_sharded(emb, k=kb)
                            else:
                                self.index.search(emb, k=kb)
                            continue
                        emb = np.zeros(
                            (b,) + tuple(self.index.embeds.shape[1:3])
                            + (self.index.embeds.shape[3],), np.float32)
                        emb = emb[:, :, : d.surface_width // 8]
                        if self._mesh is not None:
                            self.index.search_sharded(emb, k=kb,
                                                      fast=self._fast)
                        else:
                            self.index.search(emb, k=kb, fast=self._fast)
                    else:
                        group = [_Pending(img, kb, 0) for _ in range(b)]
                        self._run_group(group)
                        for r in group:
                            if r.error is not None:
                                raise r.error
        finally:
            with self._stats_lock:
                self.stats.update(before)

    def _batch_loop(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                return
            group = [item]
            deadline = time.monotonic() + self._window
            while len(group) < self.max_batch:
                remain = deadline - time.monotonic()
                if remain <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remain)
                except queue.Empty:
                    break
                if nxt is None:
                    self._run_group(group)
                    return
                group.append(nxt)
            self._run_group(group)

    def _run_group(self, group) -> None:
        import jax.numpy as jnp
        import numpy as np

        try:
            b = len(group)
            with self._stats_lock:
                self.stats["requests"] += b
                self.stats["dispatches"] += 1
            imgs = np.stack([r.img for r in group])
            # pad to a power of two: bounded compile count across batch sizes
            bucket = 1 << (b - 1).bit_length()
            if bucket > b:
                imgs = np.concatenate(
                    [imgs, np.broadcast_to(imgs[:1], (bucket - b,) + imgs.shape[1:])]
                )
            s_emb = np.asarray(self._embed(self._params, jnp.asarray(imgs)))[:b]
            # exact and approximate requests keep their own contracts; the
            # vector family serves every request exactly (its exact search is
            # one GEMM per chunk — there is no sweep cost to approximate away)
            for approx in (False, True):
                rows = [i for i, r in enumerate(group)
                        if (r.candidates > 0 and not self._vector) == approx]
                if not rows:
                    continue
                with self._stats_lock:
                    self.stats["approx_searches" if approx else
                               "exact_searches"] += len(rows)
                k_max = max(group[i].k for i in rows)
                embs = s_emb[rows]
                # pad the query axis to a power of two as well — the search
                # kernels compile per Q, and group compositions vary
                qb = 1 << (len(rows) - 1).bit_length()
                if qb > len(rows):
                    embs = np.concatenate(
                        [embs,
                         np.broadcast_to(embs[:1], (qb - len(rows),) + embs.shape[1:])]
                    )
                if approx:
                    cand = max(max(group[i].candidates for i in rows), k_max)
                    # bucket the pool size (rerank compiles per M); a larger
                    # pool than requested only improves candidate recall.
                    # Cap it: the rerank materializes a [query_block, M, ...]
                    # gallery slice on ONE device, so an unbounded client
                    # ?candidates= could pull the whole (possibly sharded-
                    # because-it-doesn't-fit) gallery onto a single chip.
                    cand = min(1 << (cand - 1).bit_length(), len(self.index),
                               self.max_candidates)
                    idx, dist, orient = self.index.search_approx(
                        embs, k=min(k_max, cand), candidates=cand,
                        fast=self._fast
                    )
                elif self._mesh is not None:
                    # k buckets: the sharded top-k compiles per k and client
                    # k values vary; results are ascending so each request
                    # slices its own k (k_max <= max_k — geolocate clamps).
                    if self._vector:
                        idx, dist = self.index.search_sharded(
                            embs, k=self._k_bucket(k_max)
                        )
                        orient = None
                    else:
                        idx, dist, orient = self.index.search_sharded(
                            embs, k=self._k_bucket(k_max), fast=self._fast
                        )
                else:
                    # same bucketing on the single-device exact path — raw
                    # client k values would compile one kernel per distinct k
                    if self._vector:
                        idx, dist = self.index.search(
                            embs, k=self._k_bucket(k_max)
                        )
                        orient = None
                    else:
                        idx, dist, orient = self.index.search(
                            embs, k=self._k_bucket(k_max), fast=self._fast
                        )
                for out_row, i in enumerate(rows):
                    r = group[i]
                    r.result = self._format(
                        idx[out_row], dist[out_row],
                        None if orient is None else orient[out_row], r.k
                    )
        except BaseException as err:  # propagate to every waiter
            with self._stats_lock:
                self.stats["errors"] += len(group)
            for r in group:
                r.error = err
        finally:
            for r in group:
                r.done.set()

    def _format(self, idx_row, dist_row, orient_row, k: int):
        import numpy as np

        # vector families have no orientation axis. SAFA's unit-vector
        # Euclidean distance lives in the same [0, 2] range as the FOV chord
        # distance, so the exp(10*(1-d)) score transform carries over; the
        # baseline family's f/||f||^0.5 embeddings are NOT unit vectors
        # (reference cvig_baseline.py:278) and its distances are unbounded,
        # so it reports the monotone exp(-d) instead — comparable within one
        # gallery, not across families.
        w = self.index.embeds.shape[2] if orient_row is not None else None
        xs = self.index.meta.get("x")
        ys = self.index.meta.get("y")
        results = []
        for j, (i, dd) in enumerate(zip(idx_row[:k], dist_row[:k])):
            score = (np.exp(-dd) if self._baseline
                     else np.exp(10.0 * (1.0 - dd)))
            results.append(
                {
                    "x": float(xs[i]) if xs is not None else None,
                    "y": float(ys[i]) if ys is not None else None,
                    "tile": int(i),
                    "distance": float(dd),
                    "orientation_deg": (
                        float(orient_row[j] * 360.0 / w - 180.0)
                        if orient_row is not None else None
                    ),
                    "score": float(score),
                }
            )
        return results


def make_handler(service: GeolocateService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default
            pass

        def _json(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                self._json(200, {
                    "status": "ok",
                    "gallery_size": len(service.index),
                    "family": service.family,
                    "int8": service._int8,
                    "max_batch": service.max_batch,
                    "sharded_devices": (
                        int(service._mesh.devices.size)
                        if service._mesh is not None else 1
                    ),
                })
            elif self.path.startswith("/stats"):
                s = dict(service.stats)
                s["uptime_s"] = round(time.time() - service.started_at, 3)
                # mean requests per device dispatch — the micro-batching win
                s["mean_batch"] = (
                    round(s["requests"] / s["dispatches"], 3)
                    if s["dispatches"] else 0.0
                )
                self._json(200, s)
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if not self.path.startswith("/geolocate"):
                self._json(404, {"error": "unknown path"})
                return
            k = 5
            candidates = 0  # 0 = exact search; >0 = two-stage approximate
            if "?" in self.path:
                for part in self.path.split("?", 1)[1].split("&"):
                    if part.startswith("k="):
                        try:
                            k = int(part[2:])
                            if k < 1:
                                raise ValueError(k)
                        except ValueError:
                            self._json(400, {"error": "bad k"})
                            return
                    elif part.startswith("candidates="):
                        try:
                            candidates = int(part[len("candidates="):])
                            if candidates < 0:
                                # negative must not silently enable a k-sized
                                # approximate pool; 0 = exact search
                                raise ValueError(candidates)
                        except ValueError:
                            self._json(400, {"error": "bad candidates"})
                            return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                self._json(400, {"error": "empty body (expect image bytes)"})
                return
            data = self.rfile.read(length)
            try:
                results = service.geolocate(data, k=k, candidates=candidates)
            except Exception as err:  # bad image etc.
                self._json(400, {"error": f"{type(err).__name__}: {err}"})
                return
            self._json(200, {"results": results})

    return Handler


def serve(service: GeolocateService, port: int = 8000,
          host: str = "127.0.0.1") -> ThreadingHTTPServer:
    """Start the HTTP server (returns it; call .serve_forever() or use the
    returned object's shutdown() from tests)."""
    return ThreadingHTTPServer((host, port), make_handler(service))


def main(argv=None):
    from witw_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    import jax

    from witw_tpu.configs import fov_experiment, safa_experiment
    from witw_tpu.evaluation.index import GalleryIndex
    from witw_tpu.evaluation.vector_index import VectorIndex
    from witw_tpu.train.checkpoint import Checkpointer
    from witw_tpu.train.pipeline import make_pipeline

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--index", required=True,
                        help="gallery index .npz (GalleryIndex for --family "
                             "fov, VectorIndex for --family safa)")
    parser.add_argument("--weights", default="./weights")
    parser.add_argument("--tag", default=None)
    parser.add_argument("--dataset", default="witw")
    parser.add_argument("--fov", type=int, default=70)
    parser.add_argument("--family", choices=("fov", "safa", "baseline"),
                        default="fov",
                        help="tower/index family: fov = FOV-DSM towers + "
                             "orientation-aligned FFT index (default); safa "
                             "= VGG16+SAFA towers + Euclidean vector index; "
                             "baseline = 7-conv GeM towers + Euclidean "
                             "vector index (--fov ignored; score = exp(-d))")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--fast-eval", action="store_true",
                        help="bf16 frequency product in the search kernels "
                             "(opt-in approximation; exact is the default)")
    parser.add_argument("--max-batch", type=int, default=0,
                        help=">=2 enables request micro-batching: concurrent "
                             "requests share one embed+search dispatch")
    parser.add_argument("--shard-gallery", action="store_true",
                        help="keep the gallery resident-sharded across every "
                             "local device (multi-chip hosts): index capacity "
                             "scales with mesh HBM; exact searches take the "
                             "shard_map top-k path")
    parser.add_argument("--batch-window-ms", type=float, default=3.0,
                        help="max wait after the first queued request before "
                             "dispatching a partial batch")
    parser.add_argument("--allow-mismatch", action="store_true",
                        help="serve even when the index's recorded precision "
                             "or weights fingerprint differs from the serving "
                             "towers (degrades ranking; default: refuse)")
    parser.add_argument("--batch-workers", type=int, default=2,
                        help="concurrent batch-dispatch threads (>=2 lets "
                             "group round trips pipeline; one worker "
                             "serializes them — slow through remote tunnels)")
    parser.add_argument("--no-warmup", action="store_true",
                        help="skip pre-compiling the per-bucket embed/search "
                             "kernels at startup (first requests then stall "
                             "on device compiles)")
    parser.add_argument("--max-candidates", type=int, default=65536,
                        help="cap on any request's approximate-search rerank "
                             "pool (the rerank gathers that many gallery "
                             "items onto one device per query)")
    args = parser.parse_args(argv)

    import os

    if args.family == "baseline":
        from witw_tpu.configs import baseline_experiment

        cfg = baseline_experiment(dataset=args.dataset)
    else:
        make_cfg = fov_experiment if args.family == "fov" else safa_experiment
        cfg = make_cfg(dataset=args.dataset, fov=args.fov)
    pipeline = make_pipeline(cfg)
    ckpt = Checkpointer(
        os.path.join(args.weights,
                     args.tag or f"{args.family}_{args.fov}_{args.dataset}")
    )
    state = ckpt.restore("best", pipeline.init(jax.random.PRNGKey(0)))
    index_cls = GalleryIndex if args.family == "fov" else VectorIndex
    index = index_cls.load(args.index)
    mesh = None
    if args.shard_gallery:
        from witw_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    service = GeolocateService(index, cfg, state, int8=args.int8,
                               fast=args.fast_eval, max_batch=args.max_batch,
                               batch_window_ms=args.batch_window_ms, mesh=mesh,
                               allow_mismatch=args.allow_mismatch,
                               batch_workers=args.batch_workers,
                               max_candidates=args.max_candidates,
                               family=args.family)
    # Bind the socket FIRST so misconfiguration (port in use) fails fast,
    # then spend the multi-bucket warmup compiles; connections made during
    # warmup queue in the listen backlog until serve_forever() starts.
    server = serve(service, args.port, args.host)
    if not args.no_warmup:
        service.warmup()
    print(f"serving {len(index)} tiles on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
