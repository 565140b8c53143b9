"""Full-gallery retrieval evaluation, blockwise and sharded.

The reference evaluates retrieval with a per-query Python loop that re-runs
the correlation/crop/distance pipeline against the entire gallery for every
single query (reference model/cvig_fov.py:544-552) — the eval wall-clock
target in BASELINE.md. Here the whole query x gallery computation is:

- one O(N) pass for every query's true-match distance (the rank threshold),
- a blockwise sweep where a jitted kernel processes a block of queries
  against the full gallery, scanning gallery chunks with ``lax.map`` to bound
  peak memory, with the query axis sharded over the device mesh (queries are
  independent — this shards the query x gallery matrix along its query axis;
  rank counts come back as one small integer vector per block).

The gallery's width-FFT and window norms are precomputed once — the per-query
work is a batched complex einsum (MXU) + inverse rFFT + compare/count, instead
of the reference's N re-runs of conv2d + roll-gather over feature maps.

Rank definition (ties count): rank(q) = #{g : d(g, q) <= d(q, q)}
(reference cvig_fov.py:552). Metrics: top-k%, top-1%, mean/median rank
(cvig_fov.py:553-567).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from witw_tpu.match.distance import window_sq_norms
from witw_tpu.match.fft_matcher import (
    candidates_vs_queries,
    gallery_vs_queries,
    query_fft,
)


def _pad_to(x: np.ndarray, size: int, axis: int = 0) -> np.ndarray:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths)


class FovGalleryEvaluator:
    """Rank computation for the FOV-DSM orientation-aligned chord distance.

    overhead_embeds (gallery) and surface_embeds (queries): [N, h, w(|sw), c]
    NHWC feature maps. ``mesh`` shards query blocks; None = single device.
    """

    def __init__(
        self,
        mesh: Optional[Mesh] = None,
        query_block: int = 128,
        gallery_chunk: int = 1024,
        use_pallas: bool = False,
        shard_gallery: bool = False,
        fast_matmul: bool = False,
    ):
        """``use_pallas`` switches the per-chunk kernel to the fused Pallas
        correlation+distance kernel (witw_tpu.ops.pallas.fused_match), which
        never materializes the [G, Q, W] correlation tensor in HBM. The XLA
        FFT path is the measured default at CVUSA feature-map shapes; the
        Pallas path trades compute for HBM headroom as Q*G grows.

        ``shard_gallery`` (requires ``mesh``) makes the gallery RESIDENT,
        physically sharded over every mesh device: each device FFTs and
        window-norms only its own gallery shard inside the jit (no
        single-device precompute ceiling), query blocks are replicated and
        stream against the local shards, and the per-shard rank counts meet
        in one psum (SURVEY.md §5.7's ring-attention analogue; replaces the
        reference's per-query loop, cvig_fov.py:544-552, at 100k+ tile
        scale). Without it the mesh shards the query axis instead.

        ``fast_matmul`` computes the frequency-domain correlation product as
        bf16 stacked-real einsums with f32 accumulation instead of a
        HIGHEST-precision complex einsum (match/fft_matcher._freq_product) —
        an opt-in APPROXIMATION (near-threshold ranks / near-tie argmax
        orientations can flip; rank agreement on planted-structure data is
        test-gated, mirroring the int8 serving path's contract). The exact
        default is the parity path — and on TPU v5e it is also the FASTER
        path at CVUSA eval scale (15.0 s vs 16.1 s measured, NOTES.md round
        3b): the flag only helps on backends where bf16 matmul rate dominates
        the concat/convert overhead (e.g. CPU)."""
        self.mesh = mesh
        self.query_block = query_block
        self.gallery_chunk = gallery_chunk
        self.use_pallas = use_pallas
        self.shard_gallery = shard_gallery
        self.fast_matmul = fast_matmul
        if shard_gallery:
            assert mesh is not None, "shard_gallery requires a mesh"
        if use_pallas and fast_matmul:
            raise ValueError(
                "fast_matmul applies to the FFT sweep only; the Pallas "
                "fused-match kernel has no bf16 frequency-product variant"
            )

    def ranks(
        self,
        overhead_embeds: np.ndarray,
        surface_embeds: np.ndarray,
        true_match: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Rank of each query's true match in the gallery (ties count,
        reference cvig_fov.py:552). ``true_match``: gallery index of each
        query's true match [Q]; None = arange (the reference's paired test
        sets, where Q == G). Asymmetric query/gallery sizes are supported
        with explicit indices."""
        if self.shard_gallery:
            return self._ranks_gallery_sharded(
                overhead_embeds, surface_embeds, true_match
            )
        n = surface_embeds.shape[0]
        if true_match is None:
            assert overhead_embeds.shape[0] == n, (
                "asymmetric query/gallery requires explicit true_match indices"
            )
        sw = surface_embeds.shape[2]
        w = overhead_embeds.shape[2]

        # One host->device upload per embedding set: the true-match row
        # select, padding, and block reshapes all happen device-side.
        # (Through the axon tunnel the duplicate 100 MB-class uploads of the
        # same embeds — once for the d_true pass, once for the sweep — were
        # most of the eval wall clock; exp/r4_eval_roofline.)
        gal = jnp.asarray(overhead_embeds, jnp.float32)
        s_dev = jnp.asarray(surface_embeds, jnp.float32)

        # --- true-match distances, one paired O(N) pass ---
        tm_rows = (
            gal
            if true_match is None
            else jnp.take(gal, jnp.asarray(true_match, jnp.int32), axis=0)
        )
        d_true = _paired_distance_batched(tm_rows, s_dev, self.fast_matmul)

        # --- precompute gallery quantities ---
        n_gal = overhead_embeds.shape[0]
        n_chunks = -(-n_gal // self.gallery_chunk)
        n_gal_pad = n_chunks * self.gallery_chunk
        gal = jnp.pad(gal, ((0, n_gal_pad - n_gal), (0, 0), (0, 0), (0, 0)))
        gal_valid = (jnp.arange(n_gal_pad) < n_gal).reshape(n_chunks, self.gallery_chunk)
        gal_idx = jnp.arange(n_gal_pad, dtype=jnp.int32).reshape(
            n_chunks, self.gallery_chunk
        )
        if self.use_pallas:
            chunk_args = (
                gal.reshape(n_chunks, self.gallery_chunk, *gal.shape[1:]),
                gal_valid,
                gal_idx,
            )
            block_fn = _make_block_counter_pallas()
        else:
            fo = jnp.fft.rfft(gal, axis=2)  # [Ng, h, wf, c]
            wsq = window_sq_norms(gal, sw)  # [Ng, w]
            fo = fo.reshape(n_chunks, self.gallery_chunk, *fo.shape[1:])
            wsq = wsq.reshape(n_chunks, self.gallery_chunk, w)
            chunk_args = (fo, wsq, gal_valid, gal_idx)
            block_fn = _make_block_counter(self.fast_matmul)

        # --- query sweep: all blocks in ONE dispatch (lax.map over query
        # blocks, each lax.map-ing over gallery chunks) ---
        qb = self.query_block
        n_qblocks = -(-n // qb)
        tm_all = _true_match_blocks(true_match, n, n_qblocks, qb)
        if self.mesh is not None:
            # Shard the per-block query axis over the whole mesh (host-side
            # build: device_put with a sharding wants committed host data on
            # multi-host meshes).
            s_np = _pad_to(np.asarray(surface_embeds, np.float32), n_qblocks * qb)
            dt_np = _pad_to(np.asarray(d_true, np.float32), n_qblocks * qb)
            qsh = NamedSharding(self.mesh, P(None, self.mesh.axis_names, None, None, None))
            dsh = NamedSharding(self.mesh, P(None, self.mesh.axis_names))
            s_arr = jax.device_put(
                s_np.reshape(n_qblocks, qb, *s_np.shape[1:]), qsh
            )
            dt_arr = jax.device_put(dt_np.reshape(n_qblocks, qb), dsh)
            tm_arr = jax.device_put(tm_all, dsh)
        else:
            pad_q = n_qblocks * qb - n
            s_arr = jnp.pad(s_dev, ((0, pad_q),) + ((0, 0),) * (s_dev.ndim - 1))
            s_arr = s_arr.reshape(n_qblocks, qb, *s_dev.shape[1:])
            dt_arr = jnp.pad(d_true, (0, pad_q)).reshape(n_qblocks, qb)
            tm_arr = jnp.asarray(tm_all)
        counts = _fetch(block_fn(*chunk_args, s_arr, dt_arr, tm_arr)).reshape(-1)[:n]
        # The true match itself counts UNCONDITIONALLY (reference semantics:
        # its tie is exact within one distance matrix, cvig_fov.py:552); the
        # sweep excluded it so kernel-batching roundoff can't drop it.
        return counts + 1

    def _ranks_gallery_sharded(
        self,
        overhead_embeds: np.ndarray,
        surface_embeds: np.ndarray,
        true_match: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Gallery-resident sharded sweep (see __init__). Rank counts are
        integer sums over gallery items, so the psum-of-shards result is
        bitwise identical to the single-device sweep."""
        from witw_tpu.parallel.mesh import gallery_sharding

        mesh = self.mesh
        n_dev = mesh.devices.size
        n = surface_embeds.shape[0]
        n_gal = overhead_embeds.shape[0]
        if true_match is None:
            assert n_gal == n, (
                "asymmetric query/gallery requires explicit true_match indices"
            )
        sw = surface_embeds.shape[2]

        d_true = np.asarray(
            _paired_distance_batched(
                jnp.asarray(_true_match_rows(overhead_embeds, true_match)),
                jnp.asarray(surface_embeds),
                self.fast_matmul,
            )
        )

        # Pad the gallery to n_dev * chunks_per_device * gallery_chunk and
        # place it sharded over ALL mesh devices; each device sees only its
        # own [local_n, h, w, c] shard from here on.
        chunk = min(self.gallery_chunk, -(-n_gal // n_dev))
        per_dev_chunks = -(-n_gal // (n_dev * chunk))
        n_gal_pad = n_dev * per_dev_chunks * chunk
        gal_np = _pad_to(np.asarray(overhead_embeds, np.float32), n_gal_pad)
        valid_np = (np.arange(n_gal_pad) < n_gal)
        idx_np = np.arange(n_gal_pad, dtype=np.int32)
        gal = jax.device_put(gal_np, gallery_sharding(mesh, 4))
        valid = jax.device_put(valid_np, gallery_sharding(mesh, 1))
        gal_idx = jax.device_put(idx_np, gallery_sharding(mesh, 1))
        # exposed for tests / introspection: proof the gallery is resident
        # sharded across every mesh device
        self.last_gallery_sharding = gal.sharding

        qb = self.query_block
        n_qblocks = -(-n // qb)
        s_all = _pad_to(np.asarray(surface_embeds, np.float32), n_qblocks * qb)
        s_all = s_all.reshape(n_qblocks, qb, *s_all.shape[1:])
        dt_all = _pad_to(np.asarray(d_true, np.float32), n_qblocks * qb)
        dt_all = dt_all.reshape(n_qblocks, qb)
        tm_all = _true_match_blocks(true_match, n, n_qblocks, qb)

        fn = _make_gallery_sharded_counter(
            mesh, sw, chunk, per_dev_chunks, self.fast_matmul
        )
        # Query blocks replicate over the (possibly multi-host) mesh: a plain
        # jnp.asarray would commit them to this process's default device only.
        from witw_tpu.parallel.mesh import replicated_sharding

        rsh = replicated_sharding(mesh)
        s_arr = jax.device_put(s_all, rsh)
        dt_arr = jax.device_put(dt_all, rsh)
        tm_arr = jax.device_put(tm_all, rsh)
        counts = _fetch(fn(gal, valid, gal_idx, s_arr, dt_arr, tm_arr))
        counts = counts.reshape(-1)[:n]
        # unconditional self-match (see ranks())
        return counts + 1

    def metrics(
        self,
        overhead_embeds: np.ndarray,
        surface_embeds: np.ndarray,
        true_match: Optional[np.ndarray] = None,
    ) -> Dict[str, float]:
        return metrics_from_ranks(
            self.ranks(overhead_embeds, surface_embeds, true_match)
        )


def _true_match_blocks(true_match, n: int, n_qblocks: int, qb: int) -> np.ndarray:
    """True-match gallery indices per query, padded (-1: matches no gallery
    item) and reshaped to [n_qblocks, qb] for the sweep counters."""
    tm = (
        np.arange(n, dtype=np.int32)
        if true_match is None
        else np.asarray(true_match, np.int32)
    )
    tm_all = np.full(n_qblocks * qb, -1, np.int32)
    tm_all[:n] = tm
    return tm_all.reshape(n_qblocks, qb)


def _true_match_rows(overhead_embeds, true_match) -> np.ndarray:
    """Gallery rows of each query's true match. The symmetric default
    (true_match=None, identity) passes the gallery through WITHOUT the fancy
    -indexed copy — at 100k+ tiles that copy is gigabytes of host memory."""
    if true_match is None:
        return np.asarray(overhead_embeds)
    return np.asarray(overhead_embeds)[np.asarray(true_match)]


def _fetch(x) -> np.ndarray:
    """Host fetch that also works for arrays whose shards live on OTHER
    processes' devices (multi-host meshes). One shared implementation
    (train/checkpoint._to_host); exercised by tests/test_multiprocess.py."""
    from witw_tpu.train.checkpoint import _to_host

    return _to_host(x)


@functools.partial(jax.jit, static_argnums=2)
def _paired_distance_batched(overhead, surface, fast: bool = False):
    """True-match distances through the SAME fft_matcher arithmetic as the
    sweep (query_fft padding + chord_scores' rsqrt/epsilon guards): the rank
    threshold ``d <= d_true`` must not be crossed by formula-level rounding
    differences between two implementations of the same math. ``fast`` must
    match the sweep's fast_matmul setting for the same reason: a bf16 sweep
    compared against an exact threshold would systematically misplace
    near-tie gallery items. (The SELF pair is immune either way: the sweep
    excludes it and ranks() counts it unconditionally — kernel-batching
    f32 accumulation differs at ~1e-7 even between the exact forms, measured.)
    (match.distance.paired_chord_distance_fft computes the identical
    quantity with divide-vs-rsqrt and no clamps; it remains the oracle
    cross-check in tests.)"""
    w = overhead.shape[2]
    sw = surface.shape[2]
    fs, s_norm = query_fft(surface, w)
    fo = jnp.fft.rfft(overhead.astype(jnp.float32), axis=2)[:, None]
    wsq = window_sq_norms(overhead, sw)[:, None]
    d, _ = candidates_vs_queries(fo, wsq, fs, s_norm, w, fast)
    return d[:, 0]


def _count_blocks_vs_chunks(fo_chunks, wsq_chunks, valid_chunks, idx_chunks,
                            s_blocks, d_true_blocks, tm_blocks, w: int,
                            fast: bool = False):
    """Count gallery items OTHER than the true match with distance <= d_true
    for every query (the true match itself contributes an unconditional +1 in
    the caller — see ranks()).

    fo_chunks: complex [C, G, h, wf, c]; wsq_chunks: [C, G, w];
    valid_chunks: bool [C, G]; idx_chunks: int32 [C, G] global gallery
    indices; s_blocks: [NB, Q, h, sw, c]; d_true_blocks: [NB, Q];
    tm_blocks: int32 [NB, Q] true-match gallery index per query. Returns
    int32 [NB, Q]. Pure (trace-time) function shared by the query-sharded
    and gallery-sharded counters."""

    def one_qblock(args):
        s_block, d_true_block, tm_block = args
        fs, s_norm = query_fft(s_block, w)  # [Q, h, wf, c], [Q]

        def one_chunk(args):
            fo, wsq, valid, idx = args
            # Shared FFT matcher kernel (match/fft_matcher.py); orientation =
            # argmax of the *unnormalized* correlation (cvig_fov.py:312-313).
            d, _ = gallery_vs_queries(fo, wsq, fs, s_norm, w, fast)  # [G, Q]
            # The self pair is EXCLUDED here: its sweep distance and d_true
            # come from differently-batched kernels whose f32 accumulation
            # orders differ (~1e-7 relative, measured), so comparing them
            # would make the true match's own tie a roundoff coin flip. The
            # reference compares within ONE distance matrix where the self
            # tie is exact (cvig_fov.py:552); the +1 in ranks() reproduces
            # that exactly.
            le = (
                (d <= d_true_block[None, :])
                & valid[:, None]
                & (idx[:, None] != tm_block[None, :])
            )
            return jnp.sum(le.astype(jnp.int32), axis=0)  # [Q]

        per_chunk = jax.lax.map(
            one_chunk, (fo_chunks, wsq_chunks, valid_chunks, idx_chunks)
        )
        return jnp.sum(per_chunk, axis=0)

    return jax.lax.map(
        one_qblock, (s_blocks, d_true_blocks, tm_blocks)
    )  # [NB, Q]


@functools.lru_cache(maxsize=4)
def _make_block_counter(fast: bool = False):
    # memoized: a fresh jit wrapper per ranks() call would retrace (and
    # re-look-up the compile cache for) the whole sweep on every eval
    @jax.jit
    def all_counts(fo_chunks, wsq_chunks, valid_chunks, idx_chunks, s_blocks,
                   d_true_blocks, tm_blocks):
        w = wsq_chunks.shape[-1]
        return _count_blocks_vs_chunks(
            fo_chunks, wsq_chunks, valid_chunks, idx_chunks, s_blocks,
            d_true_blocks, tm_blocks, w, fast,
        )

    return all_counts


def _shard_map():
    """shard_map across jax versions (public name moved)."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map
    from jax.experimental.shard_map import shard_map

    return shard_map


@functools.lru_cache(maxsize=32)
def _make_gallery_sharded_counter(mesh: Mesh, sw: int, chunk: int,
                                  per_dev_chunks: int, fast: bool = False):
    """shard_map sweep with the GALLERY resident per device.

    Each device receives its local [n_local, h, w, c] gallery shard, computes
    that shard's width-FFT and window norms locally (no replicated
    precompute), streams every query block against its chunks, and the
    per-shard counts meet in a single integer psum over the whole mesh."""
    axes = tuple(mesh.axis_names)
    P_gal4 = P(axes, None, None, None)
    P_gal1 = P(axes)

    def local_sweep(gal_l, valid_l, idx_l, s_blocks, d_true_blocks, tm_blocks):
        w = gal_l.shape[2]
        fo = jnp.fft.rfft(gal_l, axis=2)  # local shard only
        wsq = window_sq_norms(gal_l, sw)
        fo = fo.reshape(per_dev_chunks, chunk, *fo.shape[1:])
        wsq = wsq.reshape(per_dev_chunks, chunk, w)
        valid_c = valid_l.reshape(per_dev_chunks, chunk)
        idx_c = idx_l.reshape(per_dev_chunks, chunk)
        counts = _count_blocks_vs_chunks(
            fo, wsq, valid_c, idx_c, s_blocks, d_true_blocks, tm_blocks, w,
            fast,
        )
        return jax.lax.psum(counts, axis_name=axes)

    sm = _shard_map()(
        local_sweep,
        mesh=mesh,
        in_specs=(P_gal4, P_gal1, P_gal1, P(), P(), P()),
        out_specs=P(),
    )
    return jax.jit(sm)


@functools.lru_cache(maxsize=1)
def _make_block_counter_pallas():
    """Counter using the fused Pallas correlation+distance kernel
    (witw_tpu.ops.pallas.fused_match) — no [G, Q, W] tensor in HBM."""
    from witw_tpu.ops.pallas.fused_match import fused_chord_distance_nhwc

    @jax.jit
    def all_counts(gal_chunks, valid_chunks, idx_chunks, s_blocks,
                   d_true_blocks, tm_blocks):
        def one_qblock(args):
            s_block, d_true_block, tm_block = args

            def one_chunk(args):
                gal, valid, idx = args
                d, _ = fused_chord_distance_nhwc(gal, s_block)  # [G, Q]
                # self pair excluded; counted unconditionally in ranks()
                le = (
                    (d <= d_true_block[None, :])
                    & valid[:, None]
                    & (idx[:, None] != tm_block[None, :])
                )
                return jnp.sum(le.astype(jnp.int32), axis=0)

            per_chunk = jax.lax.map(
                one_chunk, (gal_chunks, valid_chunks, idx_chunks)
            )
            return jnp.sum(per_chunk, axis=0)

        return jax.lax.map(one_qblock, (s_blocks, d_true_blocks, tm_blocks))

    return all_counts


def euclidean_ranks(
    gallery_embeds: np.ndarray,
    query_embeds: np.ndarray,
    block: int = 1024,
    true_match: Optional[np.ndarray] = None,
    mesh: Optional[Mesh] = None,
) -> np.ndarray:
    """Ranks under plain Euclidean distance on embedding vectors — the
    baseline/SAFA families' eval (reference cvig_baseline.py:456-460).
    Squared distances are rank-equivalent to the reference's sqrt distances;
    ties compare identically.

    ``true_match``: gallery index of each query's true match [Q]; None =
    arange (the reference's paired test sets, where Q == G). ``mesh`` shards
    the GALLERY axis over every mesh device — each device GEMMs its own
    gallery shard against the replicated query block and the per-shard rank
    counts (and the true match's in-matrix distance) meet in one psum, so
    the sharded result is bitwise identical to the single-device sweep (the
    FOV evaluator's shard_gallery analogue for the 1-D embedding families).
    """
    nq = query_embeds.shape[0]
    ng = gallery_embeds.shape[0]
    if true_match is None:
        assert ng == nq, (
            "asymmetric query/gallery requires explicit true_match indices"
        )
        tm = np.arange(nq, dtype=np.int32)
    else:
        tm = np.asarray(true_match, np.int32)
        assert tm.shape == (nq,), (tm.shape, nq)

    if mesh is not None:
        from witw_tpu.parallel.mesh import gallery_sharding, replicated_sharding

        g_np = np.asarray(gallery_embeds, np.float32)
        q = np.asarray(query_embeds, np.float32)
        n_dev = mesh.devices.size
        ng_pad = -(-ng // n_dev) * n_dev
        g_arr = jax.device_put(_pad_to(g_np, ng_pad), gallery_sharding(mesh, 2))
        idx = jax.device_put(
            np.arange(ng_pad, dtype=np.int32), gallery_sharding(mesh, 1)
        )
        valid = jax.device_put(np.arange(ng_pad) < ng, gallery_sharding(mesh, 1))
        count_fn = _make_euclidean_sharded_counter(mesh)
        rsh = replicated_sharding(mesh)
        put = lambda x: jax.device_put(x, rsh)  # noqa: E731

        def q_block(start, stop):
            return put(_pad_to(q[start:stop], block))
    else:
        # Device arrays (e.g. straight from embed_all) pass through without a
        # host round trip; jnp.asarray on host data uploads once.
        g_arr = jnp.asarray(gallery_embeds, jnp.float32)
        q_dev = jnp.asarray(query_embeds, jnp.float32)
        idx = jnp.arange(ng, dtype=jnp.int32)
        valid = jnp.ones(ng, bool)
        count_fn = _euclidean_block_counts
        put = jnp.asarray

        def q_block(start, stop):
            qb = q_dev[start:stop]
            if stop - start < block:
                qb = jnp.pad(qb, ((0, block - (stop - start)), (0, 0)))
            return qb

    counts = np.zeros(nq, dtype=np.int32)
    for start in range(0, nq, block):
        stop = min(start + block, nq)
        tm_b = np.full(block, -1, np.int32)  # -1: matches no gallery item
        tm_b[: stop - start] = tm[start:stop]
        c = count_fn(g_arr, valid, idx, q_block(start, stop), put(tm_b))
        counts[start:stop] = _fetch(c)[: stop - start]
    # The true match itself counts unconditionally: its distance is read off
    # the SAME distance matrix inside the kernel (exact tie, reference
    # cvig_baseline.py:460), so this +1 with the kernel's != exclusion equals
    # the reference's <= count including the self pair.
    return counts + 1


def _euclidean_counts_local(g, valid, idx, q_block, tm_block, psum_axes=None):
    """Rank counts for one query block against a (possibly local-shard)
    gallery under squared Euclidean distance. The true-match distance is the
    IN-MATRIX value d2[tm, q] (gathered via a masked sum so it works when the
    row lives on another device's shard), so the self tie compares exactly and
    sharded == unsharded bitwise (each d2 element's K-axis accumulation is
    independent of the gallery split)."""
    g_sq = jnp.sum(g * g, axis=1)
    q_sq = jnp.sum(q_block * q_block, axis=1)
    d2 = g_sq[:, None] + q_sq[None, :] - 2.0 * (g @ q_block.T)  # [G(l), Qb]
    is_tm = idx[:, None] == tm_block[None, :]
    d_true = jnp.sum(jnp.where(is_tm, d2, 0.0), axis=0)  # [Qb]
    if psum_axes is not None:
        d_true = jax.lax.psum(d_true, axis_name=psum_axes)
    le = (d2 <= d_true[None, :]) & valid[:, None] & ~is_tm
    cnt = jnp.sum(le.astype(jnp.int32), axis=0)
    if psum_axes is not None:
        cnt = jax.lax.psum(cnt, axis_name=psum_axes)
    return cnt


@jax.jit
def _euclidean_block_counts(g, valid, idx, q_block, tm_block):
    """Single-device form. Module-level jit: a per-call closure would
    recapture the gallery and recompile on every euclidean_ranks() call."""
    return _euclidean_counts_local(g, valid, idx, q_block, tm_block)


@functools.lru_cache(maxsize=8)
def _make_euclidean_sharded_counter(mesh: Mesh):
    """shard_map counter with the gallery resident per device (the
    baseline-family analogue of _make_gallery_sharded_counter)."""
    axes = tuple(mesh.axis_names)

    def local_counts(g_l, valid_l, idx_l, q_block, tm_block):
        return _euclidean_counts_local(
            g_l, valid_l, idx_l, q_block, tm_block, psum_axes=axes
        )

    sm = _shard_map()(
        local_counts,
        mesh=mesh,
        in_specs=(P(axes, None), P(axes), P(axes), P(), P()),
        out_specs=P(),
    )
    return jax.jit(sm)


def metrics_from_ranks(ranks: np.ndarray) -> Dict[str, float]:
    """Reference metric suite (cvig_fov.py:553-567)."""
    count = len(ranks)
    return {
        "top_1": float(np.sum(ranks <= 1) / count * 100.0),
        "top_5": float(np.sum(ranks <= 5) / count * 100.0),
        "top_10": float(np.sum(ranks <= 10) / count * 100.0),
        "top_percent": float(np.sum(ranks * 100 <= count) / count * 100.0),
        "avg_rank": float(np.mean(ranks)),
        "med_rank": float(np.median(ranks)),
        "locations": count,
    }
