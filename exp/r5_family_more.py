#!/usr/bin/env python
"""Round 5: fill the remaining per-family perf rows + validate baseline-int8
sweep wiring on device.

  part 1  train-step throughput (fwd+bwd+Adam) for the baseline (batch 16,
          224x1232 + 750^2) and SAFA (batch 32) families — BASELINE.md has
          only the FOV family's 1096 pairs/s train row
  part 2  SAFA serving batch sweep 32/64/128 (f32 + int8): is 32 the right
          batch the way 128 is for FOV?
  part 3  heatmap sweep --family baseline --int8 smoke on a tiny grid
          (XLA:CPU can't run int8 convs at usable speed, so the int8 sweep
          wiring for this family is validated here on the TPU)

Run: PYTHONPATH=$PYTHONPATH:/root/repo python exp/r5_family_more.py
"""

# MEASURED (2026-08-21, TPU v5e): train baseline 137.3 pairs/s (116.6
# ms/step, b16), train safa 839.2 (38.1 ms, b32); safa serve f32
# 1113.8/1313.5/1751.6 and int8 1385.2/1742.5/2274.0 at b32/64/128
# (batch 128 is the sweet spot); baseline --int8 sweep smoke ok on device
# (16 tiles, saturation 0.0). BASELINE.md rows updated.

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

STEPS = 4
REPS = 5


def measure_scan(fn, *args):
    import jax

    np.asarray(fn(*args))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from witw_tpu.configs import baseline_experiment, safa_experiment
    from witw_tpu.train.pipeline import make_pipeline

    rng = np.random.default_rng(0)

    # ---- part 1: train steps ----
    for name, cfg, batch, s_hw, o_hw in (
        ("baseline", baseline_experiment(dataset="cvusa"), 16,
         (224, 1232), (750, 750)),
        ("safa", safa_experiment(dataset="cvusa", fov=360), 32,
         (128, 512), (256, 256)),
    ):
        pipeline = make_pipeline(cfg)
        if name == "baseline":
            state = pipeline.init(jax.random.PRNGKey(0), surface_hw=s_hw,
                                  overhead_hw=o_hw)
        else:
            state = pipeline.init(jax.random.PRNGKey(0))
        np.asarray(jax.tree.leaves(state.params)[0])
        surf = jnp.asarray(rng.uniform(
            0, 255, (STEPS, batch, *s_hw, 3)).astype(np.float32))
        over = jnp.asarray(rng.uniform(
            0, 255, (STEPS, batch, *o_hw, 3)).astype(np.float32))
        np.asarray(surf[0, 0, 0, 0])

        @jax.jit
        def run(state, surf, over, _p=pipeline):
            def body(st, xs):
                s, o = xs
                st, metrics = _p.train_step(
                    st, {"surface": s, "overhead": o}, jax.random.PRNGKey(1))
                return st, metrics["loss"]
            _, losses = jax.lax.scan(body, state, (surf, over))
            return losses

        best = measure_scan(run, state, surf, over)
        print(f"train {name}: {STEPS * batch / best:.1f} pairs/s "
              f"({best / STEPS * 1e3:.1f} ms/step, batch {batch})", flush=True)

    # ---- part 2: SAFA serving batch sweep ----
    from witw_tpu.match.losses import pairwise_sq_distances
    from witw_tpu.models.quantize import (
        quantize_safa_pipeline_static,
        quantized_safa_forward_static,
    )

    cfg = safa_experiment(dataset="cvusa", fov=360)
    pipe = make_pipeline(cfg)
    state = pipe.init(jax.random.PRNGKey(0))
    np.asarray(jax.tree.leaves(state.params)[0])
    d = cfg.data
    calib = {
        "surface": rng.uniform(
            0, 255, (2, d.surface_height, d.surface_width, 3)
        ).astype(np.float32),
        "overhead": rng.uniform(
            0, 255, (2, d.overhead_size, d.overhead_size, 3)
        ).astype(np.float32),
    }
    s_p, o_p = pipe._preprocess(
        {k: jnp.asarray(v) for k, v in calib.items()},
        jax.random.PRNGKey(0), False)
    sq_s, sq_o = quantize_safa_pipeline_static(
        state, [(np.asarray(s_p), np.asarray(o_p))])

    def f32_serve(s, o):
        s_in, o_in = pipe._preprocess(
            {"surface": s, "overhead": o}, jax.random.PRNGKey(0), False)
        se = pipe.surface_model.apply({"params": state.params["surface"]}, s_in)
        oe = pipe.overhead_model.apply({"params": state.params["overhead"]}, o_in)
        return pairwise_sq_distances(oe, se)

    def int8_serve(s, o):
        s_in, o_in = pipe._preprocess(
            {"surface": s, "overhead": o}, jax.random.PRNGKey(0), False)
        se = quantized_safa_forward_static(*sq_s, s_in, False)
        oe = quantized_safa_forward_static(*sq_o, o_in, True)
        return pairwise_sq_distances(oe, se)

    for label, step in (("f32", f32_serve), ("int8", int8_serve)):
        for b in (32, 64, 128):
            surf = jnp.asarray(rng.uniform(
                0, 255, (STEPS, b, d.surface_height, d.surface_width, 3)
            ).astype(np.float32))
            over = jnp.asarray(rng.uniform(
                0, 255, (STEPS, b, d.overhead_size, d.overhead_size, 3)
            ).astype(np.float32))
            np.asarray(surf[0, 0, 0, 0])

            def scan_fn(surf, over, _f=step):
                def body(c, xs):
                    s, o = xs
                    dd = _f(s, o)
                    return c, jnp.sum(dd * dd)
                _, outs = jax.lax.scan(body, 0.0, (surf, over))
                return outs

            best = measure_scan(jax.jit(scan_fn), surf, over)
            print(f"safa {label} batch {b}: {STEPS * b / best:.1f} pairs/s "
                  f"({best / STEPS * 1e3:.1f} ms/step)", flush=True)

    # ---- part 3: baseline --int8 sweep smoke on device ----
    from PIL import Image

    from witw_tpu.tools import geotiff as gt
    from witw_tpu.tools.heatmap import sweep
    from witw_tpu.evaluation.vector_index import VectorIndex

    tmp = tempfile.mkdtemp(prefix="witw_bsweep_")
    e0, n0 = 447600.0, 5411900.0
    strip = rng.integers(1, 255, size=(1600, 1600, 3), dtype=np.uint8)
    sat_path = os.path.join(tmp, "03_paris.tif")
    gt.write_geotiff_u8(sat_path, strip,
                        np.array([e0, 0.3, 0, n0, 0, -0.3]), 32631)
    photo_path = os.path.join(tmp, "q.jpg")
    Image.fromarray(
        rng.integers(0, 255, (300, 400, 3), dtype=np.uint8)).save(photo_path)
    cfg_b = baseline_experiment(dataset="witw")
    pipe_b = make_pipeline(cfg_b)
    state_b = pipe_b.init(jax.random.PRNGKey(0))
    cache = os.path.join(tmp, "b8.npz")
    t0 = time.time()
    frame = sweep(sat_path, photo_path, os.path.join(tmp, "m.csv"),
                  (e0 + 30, n0 - 400, e0 + 400, n0 - 30),
                  edge=225.0, offset=112.5, state=state_b, index_cache=cache,
                  int8=True, verbose=False, family="baseline", batch_size=4)
    meta = VectorIndex.load(cache).meta
    assert str(meta.get("precision")) == "int8"
    assert str(meta.get("family")) == "baseline"
    sat_frac = float(meta.get("int8_saturation"))
    assert np.all(np.isfinite(frame["score"]))
    print(f"baseline --int8 sweep smoke: {len(frame)} tiles in "
          f"{time.time()-t0:.1f}s, saturation {sat_frac:.4f}, scores finite",
          flush=True)
    print("SUMMARY ok", flush=True)


if __name__ == "__main__":
    main()
