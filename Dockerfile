# mimic3-tpu serving image.
#
# For Cloud TPU VMs use a JAX TPU base image / install jax[tpu]; this
# default builds a CPU image (same code path, slower) suitable for API
# testing and CI.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ \
        libespeak-ng1 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY mimic3_tpu ./mimic3_tpu
COPY native ./native
COPY scripts ./scripts

RUN pip install --no-cache-dir "jax[cpu]" numpy && \
    pip install --no-cache-dir -e . --no-build-isolation && \
    g++ -O3 -shared -fPIC native/mimic3_native.cpp \
        -o native/libmimic3_native.so

# voices are downloaded at runtime into this volume
VOLUME /root/.local/share/mycroft/mimic3/voices

EXPOSE 59125
ENTRYPOINT ["mimic3-server", "--host", "0.0.0.0"]
