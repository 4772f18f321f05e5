# delly-tpu container (role of the reference's Dockerfile:
# /root/reference/Dockerfile). CPU image by default; on a TPU VM base
# the same image picks up the TPU via the libtpu wheel (see TPU note).
FROM python:3.11-slim AS build

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ \
    zlib1g-dev \
    && apt-get clean \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/delly-tpu
COPY pyproject.toml README.md ./
COPY delly_tpu ./delly_tpu
COPY scripts ./scripts

# jax[cpu] by default; for Cloud TPU VMs build with
#   --build-arg JAX_EXTRA="jax[tpu] -f https://storage.googleapis.com/jax-releases/libtpu_releases.html"
ARG JAX_EXTRA="jax[cpu]"
RUN pip install --no-cache-dir ${JAX_EXTRA} && \
    pip install --no-cache-dir .

# pre-build the native host-I/O plane so first run is instant
RUN python -c "from delly_tpu import native; assert native.get_lib()"

FROM python:3.11-slim
RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ zlib1g \
    && apt-get clean && rm -rf /var/lib/apt/lists/*
COPY --from=build /usr/local/lib/python3.11/site-packages \
    /usr/local/lib/python3.11/site-packages
COPY --from=build /usr/local/bin/delly-tpu /usr/local/bin/delly-tpu

WORKDIR /home
ENV JAX_PLATFORMS=""
CMD ["/bin/bash"]
