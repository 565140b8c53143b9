"""Round 3: bf16 fast-matmul option for the gallery rank sweep — measured.

Times FovGalleryEvaluator.ranks at CVUSA eval scale (8832^2, h=4, w=64,
sw=64, c=16 feature maps) on the real TPU: the exact HIGHEST-precision
complex-einsum path vs the bf16 stacked-real einsum path
(match/fft_matcher._freq_product), and reports rank agreement on
planted-structure embeddings.

Run: PYTHONPATH=$PYTHONPATH:/root/repo python exp/r3_eval_fast.py [n]
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from witw_tpu.evaluation import FovGalleryEvaluator  # noqa: E402


def planted_embeds(rng, n, h=4, w=64, sw=64, c=16):
    o = rng.standard_normal((n, h, w, c)).astype(np.float32)
    s = np.empty((n, h, sw, c), np.float32)
    starts = rng.integers(0, w, size=n)
    for i in range(n):
        cols = (starts[i] + np.arange(sw)) % w
        s[i] = o[i][:, cols, :] + 0.1 * rng.standard_normal((h, sw, c))
    return o, s


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8832
    rng = np.random.default_rng(0)
    o, s = planted_embeds(rng, n)
    print(f"n={n} feature maps [*, 4, 64, 16]", flush=True)

    results = {}
    for name, fast in [("exact", False), ("bf16", True)]:
        ev = FovGalleryEvaluator(query_block=128, gallery_chunk=1024,
                                 fast_matmul=fast)
        t0 = time.time()
        ranks = ev.ranks(o, s)  # includes compile on first call
        t_compile = time.time() - t0
        t0 = time.time()
        ranks = ev.ranks(o, s)
        t_warm = time.time() - t0
        results[name] = ranks
        print(f"{name}: warm {t_warm:.2f}s (first {t_compile:.2f}s) "
              f"r@1={np.mean(ranks == 1):.4f}", flush=True)

    same = np.mean(results["exact"] == results["bf16"])
    top1_flip = np.mean((results["exact"] == 1) != (results["bf16"] == 1))
    print(f"rank agreement: {same:.4f}; top-1 flips: {top1_flip:.5f}",
          flush=True)


if __name__ == "__main__":
    main()
