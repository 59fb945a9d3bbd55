# herro-tpu container image (TPU-VM flavoured).
#
# Counterpart of the reference's Dockerfile (CUDA 12.4 + libtorch + minimap2,
# reference Dockerfile:2-31): here the accelerator stack is jax[tpu] (libtpu
# ships with the wheel; the TPU runtime is provided by the TPU VM host), the
# native host kernels build with g++ at image build time, and minimap2 is
# built from source for the overlap stage.

FROM python:3.11-slim-bookworm

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential curl git zlib1g-dev libzstd-dev \
    && rm -rf /var/lib/apt/lists/*

# minimap2 (same role as reference Dockerfile:10-16)
ARG MM2_VERSION=2.26
RUN curl -L https://github.com/lh3/minimap2/releases/download/v${MM2_VERSION}/minimap2-${MM2_VERSION}.tar.bz2 \
        | tar -xj -C /opt \
    && make -C /opt/minimap2-${MM2_VERSION} \
    && ln -s /opt/minimap2-${MM2_VERSION}/minimap2 /usr/local/bin/minimap2

WORKDIR /opt/herro-tpu
COPY pyproject.toml README.md ./
COPY herro_tpu ./herro_tpu
COPY scripts ./scripts

RUN pip install --no-cache-dir ".[tpu]" \
    && make -C herro_tpu/native \
    && python -c "import herro_tpu.native as n; assert n.available()"

ENTRYPOINT ["herro-tpu"]
CMD ["--help"]
