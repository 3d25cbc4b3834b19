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

# The compilation cache dir is chosen at runtime (parallel/setup.py
# host_cache_dir): it is fingerprinted by the host CPU features because
# XLA:CPU AOT executables crash when loaded on a host missing features
# they were compiled with.
ENTRYPOINT ["python", "-m", "embodied_tpu.models.dreamerv3.main"]
