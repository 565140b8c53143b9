"""witw_tpu — a TPU-native cross-view image geolocalization (CVIG) framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of IQTLabs/WITW
(reference: /root/reference). The reference is a set of single-GPU PyTorch
scripts (model/cvig_{baseline,fov,semantic}.py) plus GDAL-based dataset tools;
this package provides the same capabilities as a structured library:

- ``witw_tpu.configs``   — typed config tree (datasets, models, train/eval).
- ``witw_tpu.data``      — CSV pair registry + host-side loader + synthetic data.
- ``witw_tpu.ops``       — on-device image ops: polar transform, FOV crop,
                           normalization, synced rotation (all jit-friendly).
- ``witw_tpu.models``    — Flax encoders: baseline 7-conv GeM towers, VGG16
                           FOV-DSM towers (3/5-channel), weight converter.
- ``witw_tpu.match``     — FFT circular correlation, orientation alignment,
                           chord distance (streaming, no O(B^2 c h w) crop),
                           triplet losses in closed matrix form.
- ``witw_tpu.parallel``  — mesh/sharding helpers (data + gallery axes).
- ``witw_tpu.train``     — jitted train step, epoch loop, checkpointing, metrics.
- ``witw_tpu.evaluation``— sharded full-gallery retrieval eval + rank metrics.
- ``witw_tpu.tools``     — dataset construction (native C++ GeoTIFF windowed IO),
                           dataset modification, heatmap geolocation sweep,
                           Flickr scraping.

Design notes (TPU-first, not a port):
- NHWC layout and bf16 matmul-heavy compute throughout (MXU friendly).
- All per-sample CPU transforms of the reference (notably the polar transform,
  reference model/cvig_fov.py:156-209) run on-device inside jit.
- The reference's per-query Python eval loop (model/cvig_fov.py:544-552)
  becomes a blockwise sharded query x gallery computation.
"""

__version__ = "0.1.0"
