#!/usr/bin/env python
"""Round 5: measure the input pipeline (VERDICT r4 #4).

Every training/serving number so far is device-side with synthetic in-memory
batches; this records what the HOST side actually delivers:

  phase 1  per-worker decode+resize throughput (pairs/s/core) from an
           on-disk JPEG dataset at CVUSA-native sizes, via the real
           PairLoader (thread + process pool modes)
  phase 2  train-from-disk overlap: run the real jitted FOV train step fed by
           device_prefetch(PairLoader) and compare wall-clock against
           (a) the loader alone and (b) the device step alone — overlap is
           proven when total ~= max(loader, device), not their sum
  phase 3  arithmetic: cores needed to saturate the measured device step
           rate (BASELINE.md: 1096 pairs/s at batch 64 on the v5e)

Run (phase 2 needs the TPU; phases 1/3 run anywhere):
  PYTHONPATH=$PYTHONPATH:/root/repo python exp/r5_input_pipeline.py \
      [--n-pairs 128] [--batch-size 16] [--steps 6] [--skip-train]

Reference contract being measured against: the torch DataLoader worker
design, reference model/cvig_fov.py:385,402-403 (num_workers=16 decoding and
polar-transforming per-sample on host).
"""

# MEASURED (2026-08-21, 1-core tunnel host): decode+resize 90.8-99.7
# pairs/s/core (thread pool; process pool 87.9-89.0) -> ~11-12 cores
# saturate the 1096 pairs/s train step. From-disk training on ONE core is
# ~55 pairs/s end-to-end (decode+upload+dispatch serialize; overlap needs
# >=2 host cores). BASELINE.md input-pipeline row.

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def make_dataset(root, n_pairs, rng):
    """CVUSA-native-size JPEGs: surface panoramas 224x1232, overhead 750^2."""
    from PIL import Image

    pairs = []
    for i in range(n_pairs):
        s = os.path.join(root, f"s_{i}.jpg")
        o = os.path.join(root, f"o_{i}.jpg")
        Image.fromarray(
            rng.integers(0, 255, (224, 1232, 3), dtype=np.uint8)).save(s)
        Image.fromarray(
            rng.integers(0, 255, (750, 750, 3), dtype=np.uint8)).save(o)
        pairs.append((s, o))
    return pairs


def loader_rate(pairs, batch_size, mode, surface_hw, overhead_hw, workers=1):
    from witw_tpu.data.loader import PairLoader

    loader = PairLoader(
        pairs, batch_size=batch_size, surface_hw=surface_hw,
        overhead_hw=overhead_hw, shuffle=False, drop_last=True,
        num_workers=workers, worker_mode=mode,
    )
    # warm the pool + page cache with one epoch, then measure one
    for _ in loader:
        pass
    t0 = time.time()
    n = 0
    for batch in loader:
        n += len(batch["surface"])
    dt = time.time() - t0
    loader.close()
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pairs", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--skip-train", action="store_true",
                    help="phases 1+3 only (no TPU needed)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="witw_inpipe_")
    print(f"writing {args.n_pairs} JPEG pairs (224x1232 + 750^2)...",
          flush=True)
    pairs = make_dataset(tmp, args.n_pairs, rng)

    # The FOV family's host geometry: decode + resize to 128x512 surfaces and
    # 256^2 overheads (everything else runs on-device, data/loader.py).
    surface_hw, overhead_hw = (128, 512), (256, 256)

    print("phase 1: decode+resize pairs/s (one epoch, warm page cache)",
          flush=True)
    rates = {}
    for mode in ("thread", "process"):
        r = loader_rate(pairs, args.batch_size, mode, surface_hw, overhead_hw)
        rates[mode] = r
        print(f"  {mode}-pool, 1 worker: {r:.1f} pairs/s", flush=True)
    per_core = max(rates.values())

    train_rate = 1096.0  # BASELINE.md full train step, batch 64, v5e
    print(f"phase 3: cores to saturate the {train_rate:.0f} pairs/s train "
          f"step: {train_rate / per_core:.1f} (at the measured "
          f"{per_core:.1f} pairs/s/core)", flush=True)

    if args.skip_train:
        print(f"SUMMARY per_core={per_core:.1f} "
              f"cores_needed={train_rate / per_core:.1f}", flush=True)
        return

    # ---- phase 2: from-disk training overlap on the real device ----
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp  # noqa: F401

    from witw_tpu.configs import fov_experiment
    from witw_tpu.data.loader import PairLoader
    from witw_tpu.train.loop import device_prefetch
    from witw_tpu.train.pipeline import make_pipeline

    import dataclasses

    cfg = fov_experiment(dataset="cvusa", fov=360)
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, batch_size=args.batch_size))
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    np.asarray(jax.tree.leaves(state.params)[0])  # materialize

    loader = PairLoader(
        pairs, batch_size=args.batch_size, surface_hw=surface_hw,
        overhead_hw=overhead_hw, shuffle=False, drop_last=True,
        num_workers=1,
    )

    def run_epoch():
        nonlocal state
        n = 0
        for batch, count in device_prefetch(loader):
            state, metrics = pipeline.train_step(
                state, batch, jax.random.PRNGKey(n))
            n += count
        np.asarray(metrics["loss"])  # sync
        return n

    run_epoch()  # compile + warm
    t0 = time.time()
    n = run_epoch()
    t_total = time.time() - t0

    # device-alone rate at this batch size (same step, in-memory batch)
    batch0 = next(iter(loader))
    data = {k: jnp.asarray(v) for k, v in batch0.items()
            if k in ("surface", "overhead")}
    state, m = pipeline.train_step(state, data, jax.random.PRNGKey(0))
    np.asarray(m["loss"])
    t0 = time.time()
    steps = max(args.steps, 4)
    for i in range(steps):
        state, m = pipeline.train_step(state, data, jax.random.PRNGKey(i))
    np.asarray(m["loss"])
    t_dev = (time.time() - t0) / steps * (n / args.batch_size)

    t_loader = n / per_core
    overlap = (t_loader + t_dev - t_total) / min(t_loader, t_dev)
    print(f"phase 2: {n} pairs from disk: total {t_total:.1f}s; "
          f"loader-alone ~{t_loader:.1f}s, device-alone ~{t_dev:.1f}s; "
          f"overlap recovered {overlap:.0%} of min(loader, device) "
          f"(1.0 = perfect total=max, 0.0 = serial sum)", flush=True)
    print(f"SUMMARY per_core={per_core:.1f} "
          f"cores_needed={train_rate / per_core:.1f} "
          f"from_disk_total={t_total:.1f}s loader={t_loader:.1f}s "
          f"device={t_dev:.1f}s overlap={overlap:.2f}", flush=True)


if __name__ == "__main__":
    main()
