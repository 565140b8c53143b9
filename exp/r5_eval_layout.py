#!/usr/bin/env python
"""Round 5: timebox the eval-sweep layout-copy residual (VERDICT r4 #6).

The 8832^2 sweep sits at 233 ms device time vs a 140 ms composite floor; the
r4 trace attributes the residual to two [1024, 128, 33] layout copies (the
complex64 freq product's real/imag extraction feeding the inverse-DFT
matmuls) plus an einsum staging transpose. One attempt, as prescribed:

  v0  current kernel — complex HIGHEST einsum -> Re/Im extract -> two
      irdft matmuls
  v1  stacked-real formulation at f32 HIGHEST: the complex product's real
      and imaginary parts are computed DIRECTLY as two real einsums over a
      c-axis concat (the structure of the bf16 --fast-eval path, but exact),
      and the inverse DFT is ONE matmul against [C; S] stacked over f — no
      complex intermediate, no Re/Im extraction copies.

Same arithmetic count as v0 (a complex matmul is 4 real matmuls; v1 does 2
doubled-K real matmuls + 1 doubled-K epilogue); exactness differs only by
f32 summation order. Rank agreement is asserted on planted-structure data.

Usage: python exp/r5_eval_layout.py [n] [--variant v0|v1|both]
"""

# MEASURED (2026-08-21, TPU v5e, 8832^2): v0 complex 0.275 s warm,
# v1 stacked-real 0.217 s, rank agreement 1.0000 — v1 adopted into
# match/fft_matcher (_freq_product/_irfft_small).

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp.r3_eval_fast import planted_embeds  # noqa: E402


def patch_stacked():
    """Swap fft_matcher's freq product + irfft for the stacked-real pair."""
    import jax
    import jax.numpy as jnp

    from witw_tpu.match import fft_matcher as fm

    hp = jax.lax.Precision.HIGHEST
    orig = (fm._freq_product, fm._irfft_small)

    def freq_stacked(fo, fs, sub, fast):
        if fast:
            return orig[0](fo, fs, sub, fast)
        c_ax = fo.ndim - 1
        a, b = jnp.real(fo), jnp.imag(fo)
        x, y = jnp.real(fs), jnp.imag(fs)
        fs_cat = jnp.concatenate([x, y], axis=fs.ndim - 1)
        re = jnp.einsum(
            sub, jnp.concatenate([a, b], axis=c_ax), fs_cat, precision=hp)
        im = jnp.einsum(
            sub, jnp.concatenate([b, -a], axis=c_ax), fs_cat, precision=hp)
        return (re, im)

    def irdft_stacked(prod, w):
        if not isinstance(prod, tuple):
            return orig[1](prod, w)
        re, im = prod
        c, s = fm._irdft_mats(w)
        cs = jnp.concatenate([c, s], axis=0)  # [2f, w]
        stack = jnp.concatenate([re, im], axis=-1)  # [..., 2f]
        return jnp.einsum("...f,fn->...n", stack, cs, precision=hp)

    fm._freq_product = freq_stacked
    fm._irfft_small = irdft_stacked
    return orig


def unpatch(orig):
    from witw_tpu.match import fft_matcher as fm

    fm._freq_product, fm._irfft_small = orig


def time_ranks(n, query_block, chunk, label):
    import jax
    import jax.numpy as jnp

    from witw_tpu.evaluation import FovGalleryEvaluator
    from witw_tpu.evaluation import gallery as gal

    # fresh evaluator AND fresh jit caches: the block kernels memoize
    gal._make_block_counter.cache_clear()
    rng = np.random.default_rng(0)
    o, s = planted_embeds(rng, n)
    ev = FovGalleryEvaluator(query_block=query_block, gallery_chunk=chunk)
    o_dev, s_dev = jnp.asarray(o), jnp.asarray(s)
    np.asarray(o_dev), np.asarray(s_dev)
    ranks = ev.ranks(o_dev, s_dev)  # compile
    times = []
    for _ in range(3):
        t0 = time.time()
        ev.ranks(o_dev, s_dev)
        times.append(time.time() - t0)
    print(f"{label}: warm device-resident ranks() "
          f"{', '.join(f'{t:.3f}' for t in times)} s  "
          f"r@1={np.mean(ranks == 1):.4f}", flush=True)
    return np.asarray(ranks), min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=8832)
    ap.add_argument("--query-block", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--variant", default="both", choices=("v0", "v1", "both"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    results = {}
    if args.variant in ("v0", "both"):
        results["v0"] = time_ranks(args.n, args.query_block, args.chunk,
                                   "v0 complex")
    if args.variant in ("v1", "both"):
        orig = patch_stacked()
        try:
            results["v1"] = time_ranks(args.n, args.query_block, args.chunk,
                                       "v1 stacked-real")
        finally:
            unpatch(orig)
    if len(results) == 2:
        agree = np.mean(results["v0"][0] == results["v1"][0])
        print(f"rank agreement v0 vs v1: {agree:.4f}")
        print(f"SUMMARY v0={results['v0'][1]:.3f}s v1={results['v1'][1]:.3f}s")


if __name__ == "__main__":
    main()
