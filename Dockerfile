# witw_tpu container image — counterpart of the reference's CUDA image
# (reference model/Dockerfile:1-9, which builds on nvidia/cuda:11.2.1 and
# entrypoints cvig_fov.py). TPU runtimes provide libtpu via the host; this
# image carries the JAX stack and the framework.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make zlib1g-dev && rm -rf /var/lib/apt/lists/*

WORKDIR /witw-tpu
COPY requirements.txt ./
RUN pip install --no-cache-dir -r requirements.txt

COPY witw_tpu ./witw_tpu
COPY bench.py README.md ./

# Build the native GeoTIFF IO library.
RUN make -C witw_tpu/native

ENTRYPOINT ["python", "-m", "witw_tpu.cli.cvig_fov"]
