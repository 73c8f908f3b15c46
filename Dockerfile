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

RUN pip install --no-cache-dir setuptools "jax[cpu]" numpy && \
    pip install --no-cache-dir -e . --no-build-isolation && \
    g++ -O3 -shared -fPIC native/mimic3_native.cpp \
        -o native/libmimic3_native.so

# Build-time test gate (the reference re-runs its golden sample test in
# every image build — reference: Dockerfile:99-105):
# 1. deterministic synthesis through the real CLI must be byte-stable,
# 2. the espeak-ng binding must produce the exact expected IPA against
#    the REAL libespeak-ng installed above (tests/test_espeak_real.py).
COPY tests ./tests
RUN pip install --no-cache-dir pytest && \
    python -m mimic3_tpu.runtime.testvoice /tmp/voices/en_UK/test_low && \
    echo 'A rainbow is a meteorological phenomenon.' \
        | mimic3 --deterministic --no-download \
            --voices-dir /tmp/voices --voice en_UK/test_low \
            > /tmp/sample_a.wav && \
    echo 'A rainbow is a meteorological phenomenon.' \
        | mimic3 --deterministic --no-download \
            --voices-dir /tmp/voices --voice en_UK/test_low \
            > /tmp/sample_b.wav && \
    python -c "import hashlib,sys; \
a=open('/tmp/sample_a.wav','rb').read(); \
b=open('/tmp/sample_b.wav','rb').read(); \
assert len(a) > 1000 and a[:4] == b'RIFF', 'invalid WAV'; \
assert hashlib.sha256(a).digest() == hashlib.sha256(b).digest(), \
'deterministic synthesis not byte-stable'" && \
    pytest tests/test_espeak_real.py -q && \
    rm -rf /tmp/voices /tmp/sample_*.wav

# voices are downloaded at runtime into this volume
VOLUME /root/.local/share/mycroft/mimic3/voices

EXPOSE 59125
ENTRYPOINT ["mimic3-server", "--host", "0.0.0.0"]
