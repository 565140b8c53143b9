"""Gallery embedding index: persistence + top-k retrieval serving.

The reference's serve path (tools/heatmap/heatmap.py) re-embeds the whole
tile gallery for every sweep. This index persists embedded galleries (npz +
metadata) and answers top-k queries blockwise on device — the building block
for production geolocalization serving at 100k+ tile scale (BASELINE.json's
"WITW city-tile ... sharded retrieval sweep" config).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from functools import lru_cache, partial
from jax.sharding import Mesh, PartitionSpec as P

from witw_tpu.match.distance import window_sq_norms
from witw_tpu.match.fft_matcher import (
    candidates_vs_queries,
    gallery_vs_queries,
    query_fft,
)

# Module-level jits of the shared FFT matcher kernel (match/fft_matcher.py):
# compiled once per (shape, w), not once per search() call. ``fast`` selects
# the bf16 stacked-real frequency product (match/fft_matcher._freq_product) —
# an opt-in approximation; the exact complex einsum is the default.
_chunk_distances = partial(jax.jit, static_argnames=("w", "fast"))(
    lambda fo_c, wsq_c, fs, s_norm, *, w, fast=False: gallery_vs_queries(
        fo_c, wsq_c, fs, s_norm, w, fast
    )
)
_rerank_distances = partial(jax.jit, static_argnames=("w", "fast"))(
    lambda fo, wsq, fs, s_norm, *, w, fast=False: candidates_vs_queries(
        fo, wsq, fs, s_norm, w, fast
    )
)
# Approximate-search prefilter: best pooled-cosine over the S window shifts
# of one gallery chunk (search_approx chunks the gallery axis around this).
_pooled_sims = jax.jit(
    lambda sp, pooled_block: jnp.max(
        jnp.einsum("qd,nsd->qns", sp, pooled_block), axis=2
    )
)


class GalleryIndex:
    """Embedded overhead gallery with precomputed correlation quantities.

    embeds: [N, h, W, c] overhead (polar-tower) feature maps.
    meta: optional per-item metadata (e.g. tile center coordinates).
    """

    def __init__(self, embeds: np.ndarray, meta: Optional[Dict[str, np.ndarray]] = None):
        self.embeds = np.asarray(embeds, np.float32)
        self.meta = {k: np.asarray(v) for k, v in (meta or {}).items()}
        self._fo = None
        self._wsq = {}

    def __len__(self) -> int:
        return len(self.embeds)

    # ---- persistence ----

    @staticmethod
    def _npz_path(path: str) -> str:
        # np.savez_compressed APPENDS '.npz' to extension-less paths; load()
        # and exists() checks must see the same name or an extension-less
        # --index-cache silently never hits (the gallery re-embeds every run)
        return path if path.endswith(".npz") else path + ".npz"

    def save(self, path: str) -> None:
        arrays = {"embeds": self.embeds}
        arrays.update({f"meta_{k}": v for k, v in self.meta.items()})
        np.savez_compressed(self._npz_path(path), **arrays)

    @classmethod
    def load(cls, path: str) -> "GalleryIndex":
        data = np.load(cls._npz_path(path))
        meta = {
            k[len("meta_"):]: data[k] for k in data.files if k.startswith("meta_")
        }
        return cls(data["embeds"], meta)

    # ---- retrieval ----

    def _gallery_fft(self, sw: int):
        if self._fo is None or sw not in self._wsq:
            # one host->device upload feeds both tables (for a 100k-tile
            # index the f32 gallery is ~1.6 GB — uploading it once per
            # table doubled the first-call cost through a slow host link)
            gal = jnp.asarray(self.embeds)
            if self._fo is None:
                self._fo = jnp.fft.rfft(gal, axis=2)
            if sw not in self._wsq:
                self._wsq[sw] = window_sq_norms(gal, sw)
        return self._fo, self._wsq[sw]

    # Auto-residency bound for score_all: keep the gallery FFT on device when
    # its footprint (incl. the transient f32 gallery the rfft reads) stays
    # under this — ~3.4 GB total for a 100k-tile FOV index, comfortably inside
    # a v5e's 16 GB HBM. Above it, stream chunks (bounded device memory).
    RESIDENT_BYTES_MAX = 6 << 30

    def _resident_bytes(self) -> int:
        """Device bytes a resident gallery FFT costs: complex64 rFFT table,
        the transient f32 gallery it is computed from (freed after), and the
        transient padded copy _pad_chunked makes inside the jitted sweep when
        the remainder chunk forces a pad (worst case another full complex64
        table; counted unconditionally to stay conservative). The [N, Q]
        result buffer is excluded — at serving Q (<=16) it is ~6 MB at 100k
        tiles, noise next to these terms."""
        n, h, w, c = self.embeds.shape
        fo = n * h * (w // 2 + 1) * c * 8
        return 2 * fo + self.embeds.nbytes

    def score_all(
        self, surface_embeds: np.ndarray, gallery_chunk: int = 2048,
        fast: bool = False, resident: Optional[bool] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Distances + orientations of EVERY gallery item against every query
        (the heatmap sweep needs all tile scores, not top-k; reference
        heatmap.py:171-177 does this as one gallery-sized correlation).
        Returns ([N, Q] float32, [N, Q] int32).

        ``resident`` (default: auto by gallery size) keeps the gallery FFT on
        device across calls — the same cached table search() uses — so
        repeated scoring against one index (a sweep per photo) pays the
        host->device gallery upload ONCE: measured 78-186 s -> 3.5 s warm per
        score_all over a 99,856-tile index through the axon tunnel
        (exp/r4_score_resident.py; the residual is per-chunk dispatch
        latency, not data). ``resident=False`` streams chunk FFTs
        from the host-resident embeds with O(gallery_chunk) device memory,
        independent of N — the mode for galleries past RESIDENT_BYTES_MAX.
        ``fast``: bf16 frequency product (opt-in approximation; near-tie
        scores can reorder — rank agreement is test-gated on planted data).
        """
        n = len(self.embeds)
        q = surface_embeds.shape[0]
        sw = surface_embeds.shape[2]
        w = self.embeds.shape[2]
        if resident is None:
            resident = self._resident_bytes() <= self.RESIDENT_BYTES_MAX
        fs, s_norm = query_fft(jnp.asarray(surface_embeds), w)
        if resident:
            # ONE dispatch + one [N, Q] fetch: a lax.map over fixed-size
            # chunks inside a single jitted program. The per-chunk host loop
            # this replaces cost one dispatch+fetch round trip per chunk
            # (~50 ms each through the axon tunnel — 49 chunks at 100k tiles
            # was ~2.5 s of pure latency per scored photo, NOTES.md round 4c).
            fo, wsq = self._gallery_fft(sw)
            n_chunks = -(-n // gallery_chunk)
            # balanced chunks: pad < n_chunks rows instead of up to chunk-1,
            # so the device-side pad copy carries almost no dead work
            chunk = -(-n // n_chunks)
            fn = _make_resident_scoreall(w, chunk, n_chunks, n, fast)
            d, orient = fn(fo, wsq, fs, s_norm)
            return (np.asarray(d).astype(np.float32),
                    np.asarray(orient).astype(np.int32))

        out_d = np.empty((n, q), np.float32)
        out_o = np.empty((n, q), np.int32)
        for start in range(0, n, gallery_chunk):
            stop = min(start + gallery_chunk, n)
            real = stop - start
            pad = gallery_chunk - real if (real < gallery_chunk and n > gallery_chunk) else 0
            # chunk FFT/norms computed here from the host-resident
            # embeds: device memory stays O(gallery_chunk)
            gal_c = np.asarray(self.embeds[start:stop], np.float32)
            if pad:
                gal_c = np.pad(
                    gal_c, ((0, pad), (0, 0), (0, 0), (0, 0))
                )
            gal_c = jnp.asarray(gal_c)
            fo_c = jnp.fft.rfft(gal_c, axis=2)
            wsq_c = window_sq_norms(gal_c, sw)
            d, orient = _chunk_distances(fo_c, wsq_c, fs, s_norm, w=w, fast=fast)
            out_d[start:stop] = np.asarray(d)[:real]
            out_o[start:stop] = np.asarray(orient)[:real]
        return out_d, out_o

    def score_all_sharded(
        self,
        surface_embeds: np.ndarray,
        mesh: Optional[Mesh] = None,
        gallery_chunk: int = 2048,
        fast: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """:meth:`score_all` with the gallery resident-sharded over a device
        mesh (call :meth:`place_sharded` first, or pass ``mesh``): each device
        FFTs and scores only its own shard, so a multi-chip sweep splits both
        the memory and the FLOPs of the 100k-tile heatmap scoring N_dev ways.
        Same math as :meth:`score_all`; distances agree to f32 FFT roundoff
        (the shard/chunk partitioning batches the FFTs differently, exactly
        as different ``gallery_chunk`` values do)."""
        if getattr(self, "_sharded", None) is None or (
            mesh is not None and self._sharded["mesh"] != mesh
        ):
            if mesh is None:
                raise ValueError("call place_sharded(mesh) first or pass mesh=")
            self.place_sharded(mesh, gallery_chunk)
        st = self._sharded
        mesh = st["mesh"]
        n = len(self.embeds)
        sw = surface_embeds.shape[2]

        from witw_tpu.parallel.mesh import replicated_sharding

        s_arr = jax.device_put(
            np.asarray(surface_embeds, np.float32), replicated_sharding(mesh)
        )
        fn = _make_sharded_scoreall(
            mesh, sw, st["chunk"], st["per_dev_chunks"], fast
        )
        d, o = fn(st["gal"], s_arr)  # [N_pad, Q] each, device-sharded
        return (
            _fetch_sharded(d)[:n].astype(np.float32),
            _fetch_sharded(o)[:n].astype(np.int32),
        )

    # ---- approximate two-stage retrieval ----

    def _pooled(self, sw: Optional[int] = None) -> jnp.ndarray:
        """L2-normalized pooled gallery descriptors [N, S, h*c].

        For full-width queries (sw == w or sw None) the width-mean is exactly
        invariant to the circular shift the exact matcher optimizes over, so
        one descriptor per item (S=1) suffices. For NARROW queries (serving
        FOV-70 is ~19% width) a full-width gallery mean is NOT comparable to
        the query's window mean — measured top-1 candidate recall drops to
        ~0.89 at a 0.8%-of-gallery pool. So for sw < w the gallery gets
        cyclic sw-wide window means at stride sw//2 (S = ceil(w/stride));
        the coarse score is the max cosine over shifts — measured 1.00
        candidate recall at the same pool size, still ~S*hc/(h*w*c) the cost
        of the exact sweep."""
        w = self.embeds.shape[2]
        if sw is None or sw >= w:
            sw = w
        stride = w if sw == w else max(1, sw // 2)
        key = (sw, stride)
        if not hasattr(self, "_pool"):
            self._pool = {}
        if key not in self._pool:
            # Built on HOST: materializing the full [N, h, w, c] gallery on
            # one device caps approximate serving at single-device HBM even
            # when the exact path is mesh-sharded; only the small [N, S, hc]
            # descriptor table goes to the device.
            x = self.embeds  # np [N, h, w, c]
            if sw == w:
                d = np.mean(x, axis=2)[:, None]  # [N, 1, h, c]
            else:
                xx = np.concatenate([x, x[:, :, : sw - 1]], axis=2)
                cum = np.cumsum(xx, axis=2, dtype=np.float32)
                cum = np.concatenate(
                    [np.zeros_like(cum[:, :, :1]), cum], axis=2
                )
                wm = (cum[:, :, sw:] - cum[:, :, :-sw]) / sw  # [N, h, w, c]
                d = np.moveaxis(wm[:, :, ::stride], 2, 1)  # [N, S, h, c]
            d = d.reshape(len(self.embeds), d.shape[1], -1)
            d = d / np.maximum(
                np.linalg.norm(d, axis=2, keepdims=True), 1e-10
            )
            self._pool[key] = jnp.asarray(d)
        return self._pool[key]

    def search_approx(
        self,
        surface_embeds: np.ndarray,
        k: int = 10,
        candidates: int = 256,
        query_block: int = 16,
        fast: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Two-stage top-k: a pooled-cosine prefilter picks ``candidates``
        gallery items per query (a [Q, hc] x [N*S, hc] GEMM + max over the S
        window shifts — orders of magnitude cheaper than the exact sweep),
        then the exact FFT correlation + chord distance reranks only those.
        Same return contract as search(). Narrow queries (serving FOV
        fractions, sw << w) use shifted-window gallery descriptors — see
        _pooled; candidate recall at a serving-like 19% width is test-gated
        (tests/test_eval.py).

        With ``candidates >= len(index)`` this equals the exact search; the
        approximation quality is test-gated (tests/test_eval.py). Use for
        100k+ tile sweeps where the exact all-pairs pass dominates.
        """
        n = len(self.embeds)
        m = min(max(candidates, k), n)  # rerank pool always covers top-k
        k = min(k, m)
        q = surface_embeds.shape[0]
        sw = surface_embeds.shape[2]
        w = self.embeds.shape[2]

        s = jnp.asarray(surface_embeds, jnp.float32)
        sp = jnp.mean(s, axis=2).reshape(q, -1)
        sp = sp / jnp.maximum(jnp.linalg.norm(sp, axis=1, keepdims=True), 1e-10)
        pooled = self._pooled(sw)  # [N, S, hc]
        # Chunk the gallery axis: the [Q, chunk, S] similarity transient is
        # capped at ~64 MB — a single whole-gallery einsum would materialize
        # Q*N*S floats (gigabytes at the 100k-tile scale this path targets),
        # defeating the bounded-memory design of every other path here.
        s_shifts = pooled.shape[1]
        chunk_n = int(min(n, max(256, (1 << 24) // max(1, q * s_shifts))))
        sims = np.empty((q, n), np.float32)
        for n0 in range(0, n, chunk_n):
            n1 = min(n0 + chunk_n, n)
            block = pooled[n0:n1]
            if n1 - n0 < chunk_n:  # pad the tail: one compiled shape
                block = jnp.pad(
                    block, ((0, chunk_n - (n1 - n0)), (0, 0), (0, 0))
                )
            sims[:, n0:n1] = np.asarray(
                _pooled_sims(sp, block)
            )[:, : n1 - n0]
        cand = np.argpartition(-sims, m - 1, axis=1)[:, :m]  # [Q, M]

        fs_all, s_norm_all = query_fft(s, w)

        out_i = np.empty((q, k), np.int64)
        out_d = np.empty((q, k), np.float32)
        out_o = np.empty((q, k), np.int32)
        for q0 in range(0, q, query_block):
            q1 = min(q0 + query_block, q)
            idx = cand[q0:q1]  # [qb, M]
            gal = jnp.asarray(self.embeds[idx])  # [qb, M, h, w, c]
            fo = jnp.fft.rfft(gal, axis=3)
            wsq = window_sq_norms(
                gal.reshape((q1 - q0) * m, *gal.shape[2:]), sw
            ).reshape(q1 - q0, m, -1)
            d, orient = _rerank_distances(
                fo, wsq, fs_all[q0:q1], s_norm_all[q0:q1], w=w, fast=fast
            )
            d = np.asarray(d)
            orient = np.asarray(orient)
            sel = np.argpartition(d, min(k, m) - 1, axis=1)[:, :k]
            rows = np.arange(q1 - q0)[:, None]
            dd = d[rows, sel]
            order = np.argsort(dd, axis=1)
            out_d[q0:q1] = dd[rows, order]
            out_i[q0:q1] = idx[rows, sel][rows, order]
            out_o[q0:q1] = orient[rows, sel][rows, order]
        return out_i, out_d, out_o

    # ---- mesh-resident sharded retrieval ----

    def place_sharded(self, mesh: Mesh, gallery_chunk: int = 2048,
                      max_k: int = 128) -> None:
        """Shard the gallery RESIDENT across every device of ``mesh`` (same
        placement as the rank evaluator's gallery-resident sweep,
        evaluation/gallery.py). Each device holds only its own
        [n_local, h, w, c] shard; per-shard FFTs/window-norms are computed
        inside the jit on first search. Serving hosts with multi-chip meshes
        call this once at index load, then answer queries with
        :meth:`search_sharded` — gallery capacity scales with mesh size
        instead of one device's HBM.

        ``max_k`` caps the per-shard top-k width (and therefore the only
        cross-device traffic, O(n_dev * Q * k))."""
        from witw_tpu.parallel.mesh import gallery_sharding

        n = len(self.embeds)
        n_dev = mesh.devices.size
        n_local = -(-n // n_dev)
        chunk = min(gallery_chunk, n_local)
        chunk = max(chunk, min(max_k, n_local))  # per-chunk top-k needs k <= chunk
        per_dev_chunks = -(-n_local // chunk)
        n_local = per_dev_chunks * chunk
        n_pad = n_dev * n_local
        gal_np = np.asarray(self.embeds, np.float32)
        if n_pad > n:
            gal_np = np.pad(gal_np, ((0, n_pad - n), (0, 0), (0, 0), (0, 0)))
        valid_np = np.arange(n_pad) < n
        self._sharded = {
            "mesh": mesh,
            "chunk": chunk,
            "per_dev_chunks": per_dev_chunks,
            "n_local": n_local,
            "max_k": max_k,
            "gal": jax.device_put(gal_np, gallery_sharding(mesh, 4)),
            "valid": jax.device_put(valid_np, gallery_sharding(mesh, 1)),
        }
        # exposed for tests / introspection: proof the gallery is resident
        # sharded across every mesh device
        self.last_gallery_sharding = self._sharded["gal"].sharding

    def search_sharded(
        self,
        surface_embeds: np.ndarray,
        k: int = 10,
        mesh: Optional[Mesh] = None,
        gallery_chunk: int = 2048,
        fast: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Top-k with the gallery resident-sharded over a device mesh.

        Same contract as :meth:`search`, but the gallery lives physically
        sharded across all mesh devices (call :meth:`place_sharded` first, or
        pass ``mesh`` to place lazily): each device streams the replicated
        query block against its local shard's chunks and keeps a local top-k;
        the only cross-device movement is the [n_dev, Q, k_local] candidate
        lists fetched for the host-side merge. Same math as :meth:`search` —
        distances agree to f32 FFT roundoff (different chunk batching), and
        near-tie candidates may order differently. Replaces
        the reference's per-query full-gallery loop (cvig_fov.py:544-552) at
        multi-chip serving scale."""
        if getattr(self, "_sharded", None) is None or (
            mesh is not None and self._sharded["mesh"] != mesh
        ):
            if mesh is None:
                raise ValueError(
                    "call place_sharded(mesh) first or pass mesh="
                )
            self.place_sharded(mesh, gallery_chunk)
        st = self._sharded
        mesh = st["mesh"]
        n = len(self.embeds)
        n_dev = mesh.devices.size
        k = min(k, n)
        if k > st["max_k"]:
            raise ValueError(
                f"k={k} exceeds place_sharded max_k={st['max_k']}; re-place "
                "the index with a larger max_k"
            )
        k_local = min(k, st["n_local"])
        q = surface_embeds.shape[0]
        sw = surface_embeds.shape[2]

        from witw_tpu.parallel.mesh import replicated_sharding

        s_arr = jax.device_put(
            np.asarray(surface_embeds, np.float32), replicated_sharding(mesh)
        )
        fn = _make_sharded_topk(
            mesh, sw, st["chunk"], st["per_dev_chunks"], k_local, fast
        )
        d_all, i_all, o_all = fn(st["gal"], st["valid"], s_arr)
        # [n_dev, Q, k_local] each; shard d of the gathered axis holds device
        # d's candidates (out_specs concatenate in mesh-device order, matching
        # the gallery placement's leading-axis order).
        d_all = _fetch_sharded(d_all)
        i_all = _fetch_sharded(i_all) + (
            np.arange(n_dev) * st["n_local"]
        )[:, None, None]
        o_all = _fetch_sharded(o_all)

        d_flat = d_all.transpose(1, 0, 2).reshape(q, n_dev * k_local)
        i_flat = i_all.transpose(1, 0, 2).reshape(q, n_dev * k_local)
        o_flat = o_all.transpose(1, 0, 2).reshape(q, n_dev * k_local)
        sel = np.argpartition(d_flat, k - 1, axis=1)[:, :k]
        rows = np.arange(q)[:, None]
        dd = d_flat[rows, sel]
        order = np.argsort(dd, axis=1)
        return (
            i_flat[rows, sel][rows, order].astype(np.int64),
            dd[rows, order],
            o_flat[rows, sel][rows, order].astype(np.int32),
        )

    def search(
        self,
        surface_embeds: np.ndarray,
        k: int = 10,
        gallery_chunk: int = 2048,
        fast: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Top-k most similar gallery items per query.

        surface_embeds: [Q, h, sw, c]. Returns (indices [Q, k],
        distances [Q, k], orientations [Q, k]) sorted by ascending chord
        distance. Chunked on device inside ONE jitted dispatch (lax.map over
        fixed-size chunks, per-chunk top-k, on-device merge) — a warm search
        costs one round trip and fetches only the [Q, k] results, instead of
        one dispatch+fetch per chunk (~50 ms each through the axon tunnel;
        ~49 chunks at 100k tiles). ``fast``: bf16 frequency product (opt-in
        approximation).
        """
        n = len(self.embeds)
        sw = surface_embeds.shape[2]
        w = self.embeds.shape[2]
        k = min(k, n)
        fo, wsq = self._gallery_fft(sw)
        fs, s_norm = query_fft(jnp.asarray(surface_embeds), w)

        chunk = max(min(gallery_chunk, n), k)  # per-chunk top-k needs k<=chunk
        n_chunks = -(-n // chunk)
        chunk = max(-(-n // n_chunks), k)  # balanced: near-zero pad rows
        fn = _make_resident_topk(w, chunk, n_chunks, n, k, fast)
        d, i, orient = fn(fo, wsq, fs, s_norm)
        return (
            np.asarray(i).astype(np.int64),
            np.asarray(d).astype(np.float32),
            np.asarray(orient).astype(np.int32),
        )


def _fetch_sharded(x) -> np.ndarray:
    """Host fetch that also works when shards live on other processes'
    devices (multi-host serving meshes) — the one implementation lives in
    evaluation/gallery."""
    from witw_tpu.evaluation.gallery import _fetch

    return _fetch(x)


def _pad_chunked(fo, wsq, n: int, chunk: int, n_chunks: int):
    """Pad a resident gallery FFT + window-norm table to a whole number of
    chunks and reshape to [C, chunk, ...] for lax.map (runs inside jit; the
    pad copy is device-side HBM traffic, not a host round trip)."""
    n_pad = chunk * n_chunks
    if n_pad > n:
        fo = jnp.pad(fo, ((0, n_pad - n), (0, 0), (0, 0), (0, 0)))
        wsq = jnp.pad(wsq, ((0, n_pad - n), (0, 0)))
    fo = fo.reshape(n_chunks, chunk, *fo.shape[1:])
    wsq = wsq.reshape(n_chunks, chunk, wsq.shape[1])
    return fo, wsq


@lru_cache(maxsize=32)
def _make_resident_scoreall(w: int, chunk: int, n_chunks: int, n: int,
                            fast: bool):
    """Single-dispatch all-scores sweep over the device-resident gallery FFT
    (single-device analogue of _make_sharded_scoreall): lax.map over fixed-
    size chunks, one [N, Q] result fetch. Replaces a one-round-trip-per-chunk
    host loop (~50 ms per dispatch through the axon tunnel)."""

    def run(fo, wsq, fs, s_norm):
        fo_c, wsq_c = _pad_chunked(fo, wsq, n, chunk, n_chunks)

        def one_chunk(args):
            f_c, w_c = args
            return gallery_vs_queries(f_c, w_c, fs, s_norm, w, fast)

        d, o = jax.lax.map(one_chunk, (fo_c, wsq_c))  # [C, chunk, Q]
        q = s_norm.shape[0]
        return d.reshape(-1, q)[:n], o.reshape(-1, q)[:n]

    return jax.jit(run)


@lru_cache(maxsize=32)
def _make_resident_topk(w: int, chunk: int, n_chunks: int, n: int, k: int,
                        fast: bool):
    """Single-dispatch chunked top-k over the device-resident gallery FFT
    (single-device analogue of _make_sharded_topk's local function): per-
    chunk top-k + one on-device merge; only the [Q, k] results cross the
    host link. Padded tail rows are masked to +inf so they never rank."""

    def run(fo, wsq, fs, s_norm):
        fo_c, wsq_c = _pad_chunked(fo, wsq, n, chunk, n_chunks)
        valid = (jnp.arange(n_chunks * chunk) < n).reshape(n_chunks, chunk)

        def one_chunk(args):
            f_c, w_c, v = args
            d, o = gallery_vs_queries(f_c, w_c, fs, s_norm, w, fast)  # [G, Q]
            d = jnp.where(v[:, None], d, jnp.inf)
            neg_d, idx = jax.lax.top_k(-d.T, k)  # [Q, k] over the chunk axis
            oo = jnp.take_along_axis(o.T, idx, axis=1)
            return -neg_d, idx, oo

        ds, idxs, os_ = jax.lax.map(
            one_chunk, (fo_c, wsq_c, valid)
        )  # [C, Q, k] each
        q = s_norm.shape[0]
        gidx = idxs + (jnp.arange(n_chunks) * chunk)[:, None, None]
        d_flat = jnp.moveaxis(ds, 0, 1).reshape(q, -1)
        i_flat = jnp.moveaxis(gidx, 0, 1).reshape(q, -1)
        o_flat = jnp.moveaxis(os_, 0, 1).reshape(q, -1)
        neg_d, sel = jax.lax.top_k(-d_flat, k)  # ascending distance order
        return (
            -neg_d,
            jnp.take_along_axis(i_flat, sel, axis=1),
            jnp.take_along_axis(o_flat, sel, axis=1),
        )

    return jax.jit(run)


@lru_cache(maxsize=32)
def _make_sharded_scoreall(mesh: Mesh, sw: int, chunk: int,
                           per_dev_chunks: int, fast: bool):
    """shard_map all-scores sweep with the gallery resident per device:
    each device returns its local [n_local, Q] distance/orientation block;
    the blocks stay sharded until the host fetch (the heatmap sweep needs
    every tile's score, so the result IS the traffic)."""
    from witw_tpu.evaluation.gallery import _shard_map

    axes = tuple(mesh.axis_names)

    def local_scores(gal_l, s):
        w = gal_l.shape[2]
        fo = jnp.fft.rfft(gal_l, axis=2)
        wsq = window_sq_norms(gal_l, sw)
        fo = fo.reshape(per_dev_chunks, chunk, *fo.shape[1:])
        wsq = wsq.reshape(per_dev_chunks, chunk, w)
        fs, s_norm = query_fft(s, w)

        def one_chunk(args):
            fo_c, wsq_c = args
            return gallery_vs_queries(fo_c, wsq_c, fs, s_norm, w, fast)

        d, o = jax.lax.map(one_chunk, (fo, wsq))  # [C, chunk, Q]
        qn = s.shape[0]
        return d.reshape(-1, qn), o.reshape(-1, qn)

    sm = _shard_map()(
        local_scores,
        mesh=mesh,
        in_specs=(P(axes, None, None, None), P()),
        out_specs=(P(axes, None), P(axes, None)),
    )
    return jax.jit(sm)


@lru_cache(maxsize=32)
def _make_sharded_topk(mesh: Mesh, sw: int, chunk: int, per_dev_chunks: int,
                       k: int, fast: bool):
    """shard_map top-k sweep with the gallery resident per device.

    Each device FFTs/window-norms its local [n_local, h, w, c] shard inside
    the jit, streams the replicated queries against its chunks with
    ``lax.map`` (bounded memory), and keeps a running local top-k. Outputs
    keep the device axis sharded — [n_dev, Q, k] candidate lists — so the
    only cross-device traffic is the final fetch."""
    from witw_tpu.evaluation.gallery import _shard_map

    axes = tuple(mesh.axis_names)

    def local_topk(gal_l, valid_l, s):
        w = gal_l.shape[2]
        fo = jnp.fft.rfft(gal_l, axis=2)
        wsq = window_sq_norms(gal_l, sw)
        fo = fo.reshape(per_dev_chunks, chunk, *fo.shape[1:])
        wsq = wsq.reshape(per_dev_chunks, chunk, w)
        valid_c = valid_l.reshape(per_dev_chunks, chunk)
        fs, s_norm = query_fft(s, w)

        def one_chunk(args):
            fo_c, wsq_c, v = args
            d, o = gallery_vs_queries(fo_c, wsq_c, fs, s_norm, w, fast)  # [G, Q]
            d = jnp.where(v[:, None], d, jnp.inf)
            neg_d, idx = jax.lax.top_k(-d.T, k)  # [Q, k] over the chunk axis
            oo = jnp.take_along_axis(o.T, idx, axis=1)
            return -neg_d, idx, oo

        ds, idxs, os_ = jax.lax.map(
            one_chunk, (fo, wsq, valid_c)
        )  # [C, Q, k] each
        qn = s.shape[0]
        gidx = idxs + (jnp.arange(per_dev_chunks) * chunk)[:, None, None]
        d_flat = jnp.moveaxis(ds, 0, 1).reshape(qn, -1)
        i_flat = jnp.moveaxis(gidx, 0, 1).reshape(qn, -1)
        o_flat = jnp.moveaxis(os_, 0, 1).reshape(qn, -1)
        neg_d, sel = jax.lax.top_k(-d_flat, k)
        return (
            (-neg_d)[None],
            jnp.take_along_axis(i_flat, sel, axis=1)[None],
            jnp.take_along_axis(o_flat, sel, axis=1)[None],
        )

    sm = _shard_map()(
        local_topk,
        mesh=mesh,
        in_specs=(P(axes, None, None, None), P(axes), P()),
        out_specs=(P(axes, None, None),) * 3,
    )
    return jax.jit(sm)
