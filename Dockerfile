# TPU training image for embodied_tpu.
# Parity with the reference Dockerfile's role (/root/reference/Dockerfile:1-56)
# built for TPU VMs (libtpu via jax[tpu]) instead of CUDA: full environment
# suites including a DMLab source build and the patched MineRL wheel.
#
# docker build -f Dockerfile -t embodied_tpu .
# docker run -it --rm -v ~/logdir:/logdir embodied_tpu \
#   --logdir /logdir/{timestamp} --configs crafter --task crafter_reward

# --- DMLab build stage -----------------------------------------------------
# deepmind/lab publishes no wheels; build one with bazel (same recipe the
# reference pulls via danijar's install-dmlab.sh gist). Ubuntu 22.04: the
# DMLab build is known to fail on 24.04 (reference Dockerfile:7).
FROM ubuntu:22.04 AS dmlab
ENV DEBIAN_FRONTEND=noninteractive PIP_NO_CACHE_DIR=1
RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential curl ca-certificates gnupg git zip unzip \
    software-properties-common libsdl2-dev libosmesa6-dev gettext \
    freeglut3-dev libffi-dev libglu1-mesa-dev zlib1g-dev \
    && rm -rf /var/lib/apt/lists/*
RUN add-apt-repository -y ppa:deadsnakes/ppa && apt-get update && \
    apt-get install -y python3.11-dev python3.11-venv && apt-get clean
RUN python3.11 -m venv /venv --upgrade-deps
ENV PATH="/venv/bin:$PATH"
RUN curl -fsSL https://bazel.build/bazel-release.pub.gpg | \
      gpg --dearmor > /usr/share/keyrings/bazel-archive-keyring.gpg && \
    echo "deb [signed-by=/usr/share/keyrings/bazel-archive-keyring.gpg] \
      https://storage.googleapis.com/bazel-apt stable jdk1.8" \
      > /etc/apt/sources.list.d/bazel.list && \
    apt-get update && apt-get install -y bazel-6.4.0 && \
    ln -s /usr/bin/bazel-6.4.0 /usr/bin/bazel && \
    rm -rf /var/lib/apt/lists/*
RUN pip install numpy
RUN git clone --depth 1 https://github.com/deepmind/lab.git /lab
WORKDIR /lab
RUN bazel build -c opt --noenable_bzlmod \
      --action_env=PATH --python_path=/venv/bin/python \
      //python/pip_package:build_pip_package
RUN ./bazel-bin/python/pip_package/build_pip_package /wheels

# --- Runtime image ---------------------------------------------------------
FROM ubuntu:22.04
ENV DEBIAN_FRONTEND=noninteractive PYTHONUNBUFFERED=1 \
    PIP_NO_CACHE_DIR=1 PIP_ROOT_USER_ACTION=ignore MUJOCO_GL=egl
RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential git curl ca-certificates ffmpeg xvfb \
    x11-xserver-utils software-properties-common \
    libgl1 libegl1 libosmesa6 libglew-dev libsdl2-2.0-0 \
    openjdk-8-jdk \
    && rm -rf /var/lib/apt/lists/*
RUN add-apt-repository -y ppa:deadsnakes/ppa && apt-get update && \
    apt-get install -y python3.11-dev python3.11-venv && apt-get clean
RUN python3.11 -m venv /venv --upgrade-deps
ENV PATH="/venv/bin:$PATH"

WORKDIR /app
RUN pip install -U pip setuptools wheel

# TPU runtime.
RUN pip install "jax[tpu]" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY requirements.txt .
RUN pip install -r requirements.txt

# Environment suites. No `|| true`: a suite that fails to install fails
# the build so missing adapters surface here, not at runtime.
RUN pip install gymnasium ale-py "autorom[accept-rom-license]" pillow \
    crafter procgen-mirror bsuite dm-control memory-maze
COPY --from=dmlab /wheels /wheels
RUN pip install /wheels/deepmind_lab-*.whl
# Patched MineRL wheel (same fork the reference pins; cp311 matches this
# image's interpreter).
RUN pip install https://github.com/danijar/minerl/releases/download/v0.4.4-patched/minerl_mirror-0.4.4-cp311-cp311-linux_x86_64.whl

COPY . .

# Smoke-test the adapters against the installed suites at build time.
RUN python -c "import deepmind_lab, minerl, crafter, ale_py, procgen, \
bsuite, dm_control; import embodied_tpu; from embodied_tpu.envs import \
Atari, Crafter, DMLab, Minecraft, ProcGen, BSuite, DMC; print('suites ok')"

# The XLA compilation cache dir is chosen at runtime (parallel/setup.py
# host_cache_dir): it is fingerprinted by the host CPU features because
# XLA:CPU AOT executables crash when loaded on a host missing features
# they were compiled with.
ENTRYPOINT ["xvfb-run", "-a", "python", "-m", "embodied_tpu.models.dreamerv3.main"]
