# flexynesis-tpu container image.
# Build:  docker build -t flexynesis-tpu .
# Run:    docker run --rm flexynesis-tpu flexynesis-tpu --help
# On Cloud TPU VMs, base this on a libtpu-enabled image instead and install
# jax[tpu] per https://github.com/google/jax#installation.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /opt/flexynesis-tpu
COPY pyproject.toml README.md ./
COPY flexynesis_tpu ./flexynesis_tpu
COPY native ./native

RUN pip install --no-cache-dir "jax[cpu]" && \
    pip install --no-cache-dir . && \
    make -C native

ENTRYPOINT []
CMD ["flexynesis-tpu", "--help"]
