"""Round 3: serving-daemon throughput under concurrent load, batched vs not.

Measures requests/sec of GeolocateService with max_batch=1 (off) vs 8 on the
real TPU: N_CLIENTS threads fire N_REQS geolocate calls each against a
synthetic-weights FOV-70 service over a random gallery. The point of
micro-batching is amortizing the fixed dispatch+fetch cost (~25-50 ms through
the axon tunnel) and filling the MXU; this measures the realized gain.

Run: PYTHONPATH=$PYTHONPATH:/root/repo python exp/r3_serve_bench.py
"""

import io
import threading
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from PIL import Image  # noqa: E402

from witw_tpu.configs import fov_experiment  # noqa: E402
from witw_tpu.evaluation.index import GalleryIndex  # noqa: E402
from witw_tpu.tools.serve import GeolocateService  # noqa: E402
from witw_tpu.train.pipeline import make_pipeline  # noqa: E402

N_CLIENTS = 16
N_REQS = 8  # per client
GALLERY = 4096


def bench(service, photos):
    # warm every bucket shape first (compiles are not throughput)
    for p in photos[:2]:
        service.geolocate(p, k=5)
    done = threading.Barrier(N_CLIENTS + 1)

    def client(i):
        done.wait()
        for j in range(N_REQS):
            service.geolocate(photos[(i + j) % len(photos)], k=5)
        done.wait()

    threads = [threading.Thread(target=client, args=(i,)) for i in range(N_CLIENTS)]
    for t in threads:
        t.start()
    done.wait()
    t0 = time.time()
    done.wait()
    dt = time.time() - t0
    for t in threads:
        t.join()
    return N_CLIENTS * N_REQS / dt


def main():
    rng = np.random.default_rng(0)
    cfg = fov_experiment(dataset="witw", fov=70)
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    index = GalleryIndex(
        rng.standard_normal((GALLERY, 4, 64, 16)).astype(np.float32)
    )
    photos = []
    for _ in range(8):
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (240, 480, 3), dtype=np.uint8)
        ).save(buf, format="JPEG")
        photos.append(buf.getvalue())

    # (max_batch, batch_workers, warmup) — workers=1 without warmup measured
    # 6.8 vs 44.2 req/s unbatched (2026-08-18): a single batcher serializes
    # every group behind the previous dispatch+fetch round trip, and
    # first-hit bucket compiles land mid-benchmark.
    for max_batch, workers, warm in ((0, 1, True), (8, 1, False),
                                     (8, 2, True), (8, 4, True)):
        service = GeolocateService(index, cfg, state, max_batch=max_batch,
                                   batch_window_ms=5.0, batch_workers=workers)
        if warm:
            service.warmup(k=5)
        rate = bench(service, photos)
        print(f"max_batch={max_batch} workers={workers} warmup={warm}: "
              f"{rate:.1f} req/s (stats {service.stats})", flush=True)
        service.close()


if __name__ == "__main__":
    main()
