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

Run: ``python -m witw_tpu.tools.serve --index tiles.npz --weights ./weights
--tag fov_70_witw --fov 70 [--int8] [--port 8000]``

The retrieval kernel is the hoisted chunked top-k of GalleryIndex.search —
one compiled shape regardless of gallery size.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


class GeolocateService:
    """Embed-query + top-k search against a resident gallery index."""

    def __init__(self, index, cfg, state, int8: bool = False,
                 fast: bool = False):
        import jax
        import jax.numpy as jnp

        from witw_tpu.ops.image import normalize_images
        from witw_tpu.train.pipeline import make_pipeline

        self.index = index
        self.cfg = cfg
        d = cfg.data
        pipeline = make_pipeline(cfg)
        self._int8 = int8
        # bf16 frequency product in the search kernels (opt-in approximation;
        # exact is the default — see match/fft_matcher._freq_product).
        self._fast = fast
        self._sq = None  # calibrated lazily on the FIRST real query image so
        self._sq_lock = threading.Lock()  # scales match actual traffic, not a probe

        def embed_f32(params, x):
            x = normalize_images(x, d.img_mean, d.img_std)
            return pipeline.surface_model.apply({"params": params["surface"]}, x)

        def embed_int8(params, x):
            from witw_tpu.models.quantize import quantized_fov_forward_static

            x = normalize_images(x, d.img_mean, d.img_std)
            return quantized_fov_forward_static(self._sq, x, False)

        self._embed_f32 = jax.jit(embed_f32)
        self._embed_int8 = jax.jit(embed_int8)
        self._normalize = lambda x: normalize_images(x, d.img_mean, d.img_std)
        self._params = state.params

    def _embed(self, params, x):
        if not self._int8:
            return self._embed_f32(params, x)
        with self._sq_lock:
            if self._sq is None:
                import numpy as np

                from witw_tpu.models.quantize import quantize_tower_static

                self._sq = quantize_tower_static(
                    params["surface"], [np.asarray(self._normalize(x))], False
                )
        return self._embed_int8(params, x)

    def geolocate(self, image_bytes: bytes, k: int = 5, candidates: int = 0):
        import jax.numpy as jnp
        import numpy as np

        from witw_tpu.data.loader import resize_host

        from PIL import Image

        d = self.cfg.data
        img = np.asarray(Image.open(io.BytesIO(image_bytes)).convert("RGB"),
                         np.float32)
        img = resize_host(img, d.surface_height, d.surface_width)[None]
        s_emb = np.asarray(self._embed(self._params, jnp.asarray(img)))
        k = max(1, min(int(k), len(self.index)))
        if candidates:
            idx, dist, orient = self.index.search_approx(
                s_emb, k=k, candidates=max(int(candidates), k),
                fast=self._fast,
            )
        else:
            idx, dist, orient = self.index.search(s_emb, k=k, fast=self._fast)
        w = self.index.embeds.shape[2]
        xs = self.index.meta.get("x")
        ys = self.index.meta.get("y")
        results = []
        for i, dd, oo in zip(idx[0], dist[0], orient[0]):
            results.append(
                {
                    "x": float(xs[i]) if xs is not None else None,
                    "y": float(ys[i]) if ys is not None else None,
                    "tile": int(i),
                    "distance": float(dd),
                    "orientation_deg": float(oo * 360.0 / w - 180.0),
                    "score": float(np.exp(10.0 * (1.0 - dd))),
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
                    "int8": service._int8,
                })
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
    import jax

    from witw_tpu.configs import fov_experiment
    from witw_tpu.evaluation.index import GalleryIndex
    from witw_tpu.train.checkpoint import Checkpointer
    from witw_tpu.train.pipeline import make_pipeline

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--index", required=True, help="GalleryIndex .npz")
    parser.add_argument("--weights", default="./weights")
    parser.add_argument("--tag", default=None)
    parser.add_argument("--dataset", default="witw")
    parser.add_argument("--fov", type=int, default=70)
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--fast-eval", action="store_true",
                        help="bf16 frequency product in the search kernels "
                             "(opt-in approximation; exact is the default)")
    args = parser.parse_args(argv)

    import os

    cfg = fov_experiment(dataset=args.dataset, fov=args.fov)
    pipeline = make_pipeline(cfg)
    ckpt = Checkpointer(
        os.path.join(args.weights, args.tag or f"fov_{args.fov}_{args.dataset}")
    )
    state = ckpt.restore("best", pipeline.init(jax.random.PRNGKey(0)))
    index = GalleryIndex.load(args.index)
    service = GeolocateService(index, cfg, state, int8=args.int8,
                               fast=args.fast_eval)
    server = serve(service, args.port, args.host)
    print(f"serving {len(index)} tiles on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
