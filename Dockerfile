# piper_tpu container image (counterpart of the reference's Dockerfile,
# which builds the C++ piper binary into a distributable tarball;
# reference: /root/reference/Dockerfile).
#
# Build stage compiles the native host kernels (csrc/) and installs the
# package with its console scripts; the runtime stage is a slim image
# whose JAX backend is selected at build time:
#
#   docker build -t piper-tpu .                        # CPU jax (default)
#   docker build --build-arg JAX_EXTRA=tpu -t piper-tpu .   # Cloud TPU VM
#
# Smoke test mirrors the reference's `./build/piper --help` check.

FROM python:3.11-slim AS build

ENV LANG=C.UTF-8
ENV DEBIAN_FRONTEND=noninteractive

RUN apt-get update && \
    apt-get install --yes --no-install-recommends build-essential make

WORKDIR /build
COPY ./ ./

# Native host kernels (WAV header, int16 normalize, mu-law, RMS)
RUN make -C csrc

# Wheel with the prebuilt shared library bundled
RUN pip install --no-cache-dir build && python -m build --wheel

# -----------------------------------------------------------------------------

FROM python:3.11-slim AS runtime

# "cpu" for portable CPU inference; "tpu" pulls libtpu for Cloud TPU VMs
ARG JAX_EXTRA=cpu

ENV LANG=C.UTF-8
COPY --from=build /build/dist/*.whl /tmp/
RUN pip install --no-cache-dir "jax[${JAX_EXTRA}]" && \
    pip install --no-cache-dir /tmp/*.whl && rm /tmp/*.whl

# Persistent XLA compilation cache (serving ladder) lives in a volume
ENV PIPER_TPU_CACHE=/cache
VOLUME /cache

# Do a test run (reference parity: Dockerfile:28)
RUN piper-tpu --help

EXPOSE 5000
ENTRYPOINT ["piper-tpu"]
