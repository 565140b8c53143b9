#!/usr/bin/env python
"""Round 4: trace-pinned roofline for the eval rank sweep (VERDICT r3 #4).

BASELINE.md quotes 15.0 s warm for the 8832^2 CVUSA-scale ranks() with only
"within ~2x of the bf16 algorithmic floor" as justification. This script
gives the sweep the same treatment as the serving bench: run ranks() warm at
eval scale on the real TPU under jax.profiler.start_trace, attribute device
time per op/phase, and compare against per-phase algorithmic floors
(MXU-rate floor for the frequency product, HBM floor for the irfft +
compare/count traffic).

Phases of ranks() (evaluation/gallery.py):
  1. d_true pass          — one paired-distance dispatch over all queries
  2. gallery precompute   — rfft + window norms over the gallery (host->dev
                            upload + two device ops)
  3. the sweep            — ONE dispatch: lax.map over query blocks x
                            lax.map over gallery chunks (freq product einsum,
                            irfft, compare/count)
  4. fetch                — [NB, Q] int32 counts back through the tunnel

Usage: python exp/r4_eval_roofline.py [n] [--query-block QB] [--chunk C]
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp.profile_bench import parse_trace  # noqa: E402
from exp.r3_eval_fast import planted_embeds  # noqa: E402


def floors(n, h=4, w=64, sw=64, c=16):
    """Algorithmic floors for the [n x n] sweep at v5e rates."""
    wf = w // 2 + 1
    pairs = n * n
    # freq product: [G,h,wf,c] x [Q,h,wf,c] -> [G,Q,wf] contraction over
    # h*c, complex (4 real matmuls at HIGHEST precision over f32 operands,
    # each f32 matmul costing ~3 bf16 MXU passes)
    mxu_flops = pairs * wf * (h * c) * 2 * 4
    # irfft as dense DFT matmul (XLA's small-N lowering): [wf]->[w] per pair
    irfft_flops = pairs * w * wf * 2 * 4
    # HBM traffic for the two big intermediates per pair: freq product
    # [G,Q,wf] c64 written+read, corr [G,Q,w] f32 written+read
    hbm_bytes = pairs * (wf * 8 + w * 4) * 2
    bf16_peak = 197e12
    hbm_rate = 800e9
    print(f"--- algorithmic floors (n={n}, maps [*,{h},{w},{c}], sw={sw}) ---")
    print(f"freq product: {mxu_flops/1e12:.2f} TFLOP "
          f"(f32-as-3xbf16: {3*mxu_flops/1e12:.2f} TFLOP-eq) "
          f"-> {3*mxu_flops/bf16_peak:.2f} s at bf16 peak")
    print(f"irfft (dense DFT): {irfft_flops/1e12:.2f} TFLOP "
          f"-> {3*irfft_flops/bf16_peak:.2f} s at bf16 peak")
    print(f"intermediate HBM traffic: {hbm_bytes/1e9:.1f} GB "
          f"-> {hbm_bytes/hbm_rate:.2f} s at {hbm_rate/1e9:.0f} GB/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=8832)
    ap.add_argument("--query-block", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from witw_tpu.evaluation import FovGalleryEvaluator

    rng = np.random.default_rng(0)
    o, s = planted_embeds(rng, args.n)
    ev = FovGalleryEvaluator(query_block=args.query_block,
                             gallery_chunk=args.chunk)

    t0 = time.time()
    ranks = ev.ranks(o, s)
    print(f"cold ranks(): {time.time()-t0:.2f}s r@1={np.mean(ranks==1):.4f}",
          flush=True)
    times = []
    for _ in range(2):
        t0 = time.time()
        ev.ranks(o, s)
        times.append(time.time() - t0)
    print(f"warm ranks(): {', '.join(f'{t:.2f}' for t in times)} s", flush=True)

    # Device-resident embeds — the real test() path (embed_all keeps the
    # tower outputs on device): no host->device upload inside ranks().
    import jax.numpy as jnp

    o_dev = jnp.asarray(o)
    s_dev = jnp.asarray(s)
    np.asarray(o_dev), np.asarray(s_dev)  # force the uploads to finish
    times = []
    for _ in range(2):
        t0 = time.time()
        ev.ranks(o_dev, s_dev)
        times.append(time.time() - t0)
    print(f"warm ranks(), device-resident embeds: "
          f"{', '.join(f'{t:.2f}' for t in times)} s", flush=True)

    floors(args.n)

    trace_dir = tempfile.mkdtemp(prefix="witw_evaltrace_")
    jax.profiler.start_trace(trace_dir)
    t0 = time.time()
    ev.ranks(o, s)
    t_traced = time.time() - t0
    jax.profiler.stop_trace()
    print(f"\ntraced warm ranks(): {t_traced:.2f}s (device attribution below)")
    total_ms = parse_trace(trace_dir, args.top, 1, args.n)
    print(f"\nwall {t_traced:.2f}s vs device {total_ms/1e3:.2f}s "
          f"-> host/tunnel overhead {t_traced - total_ms/1e3:.2f}s")
    if args.keep:
        print(f"trace kept at {trace_dir}")
    else:
        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
