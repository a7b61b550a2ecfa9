# Container build for the syzgydb_tpu server (reference: /root/reference/Dockerfile).
# Assumes a base image with jax preinstalled for the target accelerator
# (e.g. a TPU VM image); swap BASE_IMAGE accordingly.
ARG BASE_IMAGE=python:3.12-slim
FROM ${BASE_IMAGE}

WORKDIR /app
COPY syzgydb_tpu ./syzgydb_tpu
COPY native ./native
COPY html ./html
COPY clients ./clients
COPY setup.py README.md ./

RUN apt-get update && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/* \
    && make -C native \
    && pip install --no-cache-dir .

ENV DATA_FOLDER=/data
ENV HTML_ROOT=/app/html
VOLUME /data
EXPOSE 8080

CMD ["python", "-m", "syzgydb_tpu.tools.cli", "--serve"]
