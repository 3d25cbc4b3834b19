# TPU training image for embodied_tpu.
# Parity with the reference Dockerfile's role (env suites + entry), built
# for TPU VMs (libtpu via jax[tpu]) instead of CUDA.

FROM python:3.12-slim-bookworm

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential git ffmpeg xvfb libgl1 libegl1 libosmesa6 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

RUN pip install --no-cache-dir -U pip setuptools wheel

# TPU runtime.
RUN pip install --no-cache-dir "jax[tpu]" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

# Env suites (best effort; each is optional at runtime).
RUN pip install --no-cache-dir \
    gymnasium ale-py crafter pillow procgen bsuite || true
RUN pip install --no-cache-dir "dm-control" || true

COPY . .

ENV JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
ENTRYPOINT ["python", "-m", "embodied_tpu.models.dreamerv3.main"]
