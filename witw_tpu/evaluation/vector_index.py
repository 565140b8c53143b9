"""Flat-vector gallery index: persistence + top-k Euclidean retrieval.

The FOV family's :class:`~witw_tpu.evaluation.index.GalleryIndex` matches
[N, h, w, c] feature maps with an orientation-aligned FFT sweep; the SAFA and
baseline towers emit flat embedding VECTORS matched with plain Euclidean
distance (reference model/cvig_baseline.py:272-279,456-463). This gives those
families the same serving capabilities the FOV index has: npz persistence
with metadata, chunked top-k in bounded device memory with one compiled
kernel per gallery width, device-resident gallery caching across calls, and
a mesh-sharded search whose capacity scales with mesh HBM.

Distances are true Euclidean (sqrt). The SAFA tower L2-normalizes, so its
distances live in [0, 2] like the FOV chord distance and the exp(10*(1-d))
serving score transform carries over. The BASELINE tower normalizes by
sqrt(norm) (reference model/cvig_baseline.py:278) — embeddings are NOT unit
vectors and distances are unbounded, so baseline serving uses its own score
calibration (see tools/serve.py); ranks are unaffected either way and match
the squared form evaluation.gallery's euclidean_ranks uses.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh, PartitionSpec as P


@jax.jit
def _chunk_dists(gal_c: jnp.ndarray, g2_c: jnp.ndarray, q: jnp.ndarray,
                 q2: jnp.ndarray) -> jnp.ndarray:
    """[Q, G] Euclidean distances of one gallery chunk: one GEMM plus norms.
    Padded gallery rows are zero vectors (g2 = 0, distance sqrt(q2)); callers
    are responsible for excluding them — via result slicing ([:real]) or the
    explicit valid masks each call site applies — before trusting a top-k."""
    d2 = q2[:, None] + g2_c[None, :] - 2.0 * q @ gal_c.T
    return jnp.sqrt(jnp.maximum(d2, 0.0))


@partial(jax.jit, static_argnames=("k",))
def _resident_topk(gal: jnp.ndarray, g2: jnp.ndarray, q: jnp.ndarray,
                   q2: jnp.ndarray, *, k: int):
    """Whole-gallery top-k in ONE dispatch: the [Q, N] distance matrix is one
    GEMM (tiny next to the gallery itself — 6.4 MB at Q=16, N=100k), so no
    chunking is needed on the resident path; only the [Q, k] results cross
    the host link."""
    d = _chunk_dists(gal, g2, q, q2)
    neg_d, idx = jax.lax.top_k(-d, k)
    return -neg_d, idx


class VectorIndex:
    """Embedded gallery of flat unit vectors (SAFA / baseline families).

    embeds: [N, D] float32 embedding vectors.
    meta: optional per-item metadata (e.g. tile center coordinates) plus the
    provenance keys the serving daemon checks (``precision``, ``params_sha``).
    """

    def __init__(self, embeds: np.ndarray,
                 meta: Optional[Dict[str, np.ndarray]] = None):
        self.embeds = np.asarray(embeds, np.float32)
        assert self.embeds.ndim == 2, (
            f"VectorIndex holds [N, D] vectors, got shape "
            f"{self.embeds.shape} — [N, h, w, c] feature maps belong in "
            "GalleryIndex (the FOV family's FFT index)"
        )
        self.meta = {k: np.asarray(v) for k, v in (meta or {}).items()}
        self._gal = None  # device-resident gallery + squared norms, cached
        self._g2 = None   # across calls like GalleryIndex._gallery_fft

    def __len__(self) -> int:
        return len(self.embeds)

    # ---- persistence (same npz contract as GalleryIndex) ----

    @staticmethod
    def _npz_path(path: str) -> str:
        return path if path.endswith(".npz") else path + ".npz"

    def save(self, path: str) -> None:
        arrays = {"embeds": self.embeds}
        arrays.update({f"meta_{k}": v for k, v in self.meta.items()})
        np.savez_compressed(self._npz_path(path), **arrays)

    @classmethod
    def load(cls, path: str) -> "VectorIndex":
        data = np.load(cls._npz_path(path))
        embeds = data["embeds"]
        if embeds.ndim != 2:
            raise ValueError(
                f"{path}: embeds are {embeds.ndim}-D — this file holds an "
                "FOV-family GalleryIndex; load it with GalleryIndex.load"
            )
        meta = {
            k[len("meta_"):]: data[k]
            for k in data.files if k.startswith("meta_")
        }
        return cls(embeds, meta)

    # ---- retrieval ----

    # Residency bound for score_all, mirroring GalleryIndex: vector galleries
    # are small (a 100k-tile SAFA index at D=4096 is 1.6 GB) so residency is
    # the norm; streaming mode exists for galleries past this.
    RESIDENT_BYTES_MAX = 6 << 30

    def _gallery(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self._gal is None:
            self._gal = jnp.asarray(self.embeds)
            self._g2 = jnp.sum(self._gal * self._gal, axis=1)
        return self._gal, self._g2

    def search(
        self, query_embeds: np.ndarray, k: int = 10,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k nearest gallery items per query.

        query_embeds: [Q, D]. Returns (indices [Q, k], distances [Q, k])
        sorted by ascending Euclidean distance. One device dispatch: the
        whole [Q, N] distance matrix is a single GEMM over the resident
        gallery and only the [Q, k] results are fetched — the same serving
        contract as GalleryIndex.search minus the orientation axis these
        families don't have. Galleries past one device's HBM use
        :meth:`search_sharded` instead."""
        n = len(self.embeds)
        q_arr = jnp.asarray(query_embeds, jnp.float32)
        q2 = jnp.sum(q_arr * q_arr, axis=1)
        gal, g2 = self._gallery()
        k = min(k, n)
        d, i = _resident_topk(gal, g2, q_arr, q2, k=k)
        return np.asarray(i).astype(np.int64), np.asarray(d).astype(np.float32)

    def score_all(
        self, query_embeds: np.ndarray, gallery_chunk: int = 8192,
        resident: Optional[bool] = None,
    ) -> np.ndarray:
        """Distances of EVERY gallery item against every query — the heatmap
        sweep's contract (all tile scores, not top-k). Returns [N, Q] f32.

        ``resident`` (default: auto by gallery size) keeps the gallery on
        device across calls and computes all distances in ONE dispatch;
        ``resident=False`` streams chunks from the host-resident embeds with
        O(gallery_chunk) device memory."""
        n = len(self.embeds)
        if resident is None:
            resident = self.embeds.nbytes <= self.RESIDENT_BYTES_MAX
        q_arr = jnp.asarray(query_embeds, jnp.float32)
        q2 = jnp.sum(q_arr * q_arr, axis=1)
        qn = q_arr.shape[0]
        if resident:
            gal, g2 = self._gallery()
            d = np.asarray(_chunk_dists(gal, g2, q_arr, q2))  # [Q, N]
            return np.ascontiguousarray(d.T)

        out = np.empty((n, qn), np.float32)
        for start in range(0, n, gallery_chunk):
            stop = min(start + gallery_chunk, n)
            real = stop - start
            pad = (gallery_chunk - real
                   if (real < gallery_chunk and n > gallery_chunk) else 0)
            gal_np = np.asarray(self.embeds[start:stop], np.float32)
            if pad:
                gal_np = np.pad(gal_np, ((0, pad), (0, 0)))
            gal_c = jnp.asarray(gal_np)
            g2_c = jnp.sum(gal_c * gal_c, axis=1)
            d = np.asarray(_chunk_dists(gal_c, g2_c, q_arr, q2))
            out[start:stop] = d.T[:real]
        return out

    # ---- mesh-resident sharded retrieval ----

    def place_sharded(self, mesh: Mesh, gallery_chunk: int = 8192,
                      max_k: int = 128) -> None:
        """Shard the gallery RESIDENT across every device of ``mesh`` —
        index capacity scales with mesh HBM instead of one device's. Same
        placement contract as GalleryIndex.place_sharded."""
        from witw_tpu.parallel.mesh import gallery_sharding

        n = len(self.embeds)
        n_dev = mesh.devices.size
        n_local = -(-n // n_dev)
        chunk = min(gallery_chunk, n_local)
        chunk = max(chunk, min(max_k, n_local))
        per_dev_chunks = -(-n_local // chunk)
        n_local = per_dev_chunks * chunk
        n_pad = n_dev * n_local
        gal_np = np.asarray(self.embeds, np.float32)
        if n_pad > n:
            gal_np = np.pad(gal_np, ((0, n_pad - n), (0, 0)))
        valid_np = np.arange(n_pad) < n
        self._sharded = {
            "mesh": mesh,
            "chunk": chunk,
            "per_dev_chunks": per_dev_chunks,
            "n_local": n_local,
            "max_k": max_k,
            "gal": jax.device_put(gal_np, gallery_sharding(mesh, 2)),
            "valid": jax.device_put(valid_np, gallery_sharding(mesh, 1)),
        }
        self.last_gallery_sharding = self._sharded["gal"].sharding

    def search_sharded(
        self, query_embeds: np.ndarray, k: int = 10,
        mesh: Optional[Mesh] = None, gallery_chunk: int = 8192,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k with the gallery resident-sharded over a device mesh: each
        device GEMMs the replicated queries against its local shard's chunks
        and keeps a local top-k; the only cross-device traffic is the
        [n_dev, Q, k_local] candidate fetch for the host-side merge. Same
        math as :meth:`search` (distances agree to f32 GEMM roundoff;
        near-tie candidates may order differently)."""
        if getattr(self, "_sharded", None) is None or (
            mesh is not None and self._sharded["mesh"] != mesh
        ):
            if mesh is None:
                raise ValueError("call place_sharded(mesh) first or pass mesh=")
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
        q = query_embeds.shape[0]

        from witw_tpu.parallel.mesh import replicated_sharding

        q_arr = jax.device_put(
            np.asarray(query_embeds, np.float32), replicated_sharding(mesh)
        )
        fn = _make_sharded_vec_topk(
            mesh, st["chunk"], st["per_dev_chunks"], k_local
        )
        d_all, i_all = fn(st["gal"], st["valid"], q_arr)
        d_all = _fetch_sharded(d_all)
        i_all = _fetch_sharded(i_all) + (
            np.arange(n_dev) * st["n_local"]
        )[:, None, None]

        d_flat = d_all.transpose(1, 0, 2).reshape(q, n_dev * k_local)
        i_flat = i_all.transpose(1, 0, 2).reshape(q, n_dev * k_local)
        sel = np.argpartition(d_flat, k - 1, axis=1)[:, :k]
        rows = np.arange(q)[:, None]
        dd = d_flat[rows, sel]
        order = np.argsort(dd, axis=1)
        return (
            i_flat[rows, sel][rows, order].astype(np.int64),
            dd[rows, order],
        )

    def score_all_sharded(
        self, query_embeds: np.ndarray, mesh: Optional[Mesh] = None,
        gallery_chunk: int = 8192,
    ) -> np.ndarray:
        """:meth:`score_all` with the gallery resident-sharded over a mesh:
        each device scores only its own shard (multi-chip sweeps split both
        memory and FLOPs). Returns [N, Q] f32."""
        if getattr(self, "_sharded", None) is None or (
            mesh is not None and self._sharded["mesh"] != mesh
        ):
            if mesh is None:
                raise ValueError("call place_sharded(mesh) first or pass mesh=")
            self.place_sharded(mesh, gallery_chunk)
        st = self._sharded
        mesh = st["mesh"]
        n = len(self.embeds)

        from witw_tpu.parallel.mesh import replicated_sharding

        q_arr = jax.device_put(
            np.asarray(query_embeds, np.float32), replicated_sharding(mesh)
        )
        fn = _make_sharded_vec_scoreall(mesh, st["chunk"], st["per_dev_chunks"])
        d = fn(st["gal"], q_arr)
        return _fetch_sharded(d)[:n].astype(np.float32)


def _fetch_sharded(x) -> np.ndarray:
    from witw_tpu.evaluation.gallery import _fetch

    return _fetch(x)


@lru_cache(maxsize=32)
def _make_sharded_vec_topk(mesh: Mesh, chunk: int, per_dev_chunks: int,
                           k: int):
    from witw_tpu.evaluation.gallery import _shard_map

    axes = tuple(mesh.axis_names)

    def local_topk(gal_l, valid_l, q):
        g2 = jnp.sum(gal_l * gal_l, axis=1)
        gal_c = gal_l.reshape(per_dev_chunks, chunk, gal_l.shape[1])
        g2_c = g2.reshape(per_dev_chunks, chunk)
        valid_c = valid_l.reshape(per_dev_chunks, chunk)
        q2 = jnp.sum(q * q, axis=1)

        def one_chunk(args):
            g_c, n_c, v = args
            d = _chunk_dists(g_c, n_c, q, q2)  # [Q, chunk]
            d = jnp.where(v[None, :], d, jnp.inf)
            neg_d, idx = jax.lax.top_k(-d, k)
            return -neg_d, idx

        ds, idxs = jax.lax.map(one_chunk, (gal_c, g2_c, valid_c))  # [C, Q, k]
        qn = q.shape[0]
        gidx = idxs + (jnp.arange(per_dev_chunks) * chunk)[:, None, None]
        d_flat = jnp.moveaxis(ds, 0, 1).reshape(qn, -1)
        i_flat = jnp.moveaxis(gidx, 0, 1).reshape(qn, -1)
        neg_d, sel = jax.lax.top_k(-d_flat, k)
        return (
            (-neg_d)[None],
            jnp.take_along_axis(i_flat, sel, axis=1)[None],
        )

    sm = _shard_map()(
        local_topk,
        mesh=mesh,
        in_specs=(P(axes, None), P(axes), P()),
        out_specs=(P(axes, None, None),) * 2,
    )
    return jax.jit(sm)


@lru_cache(maxsize=32)
def _make_sharded_vec_scoreall(mesh: Mesh, chunk: int, per_dev_chunks: int):
    from witw_tpu.evaluation.gallery import _shard_map

    axes = tuple(mesh.axis_names)

    def local_scores(gal_l, q):
        g2 = jnp.sum(gal_l * gal_l, axis=1)
        gal_c = gal_l.reshape(per_dev_chunks, chunk, gal_l.shape[1])
        g2_c = g2.reshape(per_dev_chunks, chunk)
        q2 = jnp.sum(q * q, axis=1)

        def one_chunk(args):
            g_c, n_c = args
            return _chunk_dists(g_c, n_c, q, q2).T  # [chunk, Q]

        d = jax.lax.map(one_chunk, (gal_c, g2_c))  # [C, chunk, Q]
        return d.reshape(-1, q.shape[0])

    sm = _shard_map()(
        local_scores,
        mesh=mesh,
        in_specs=(P(axes, None), P()),
        out_specs=P(axes, None),
    )
    return jax.jit(sm)
