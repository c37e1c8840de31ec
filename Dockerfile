# TPU deployment image (counterpart of the reference's GPU/CPU Dockerfiles).
# Run on a Cloud TPU VM (v5e+); jax[tpu] brings libtpu.
FROM python:3.11-slim

ENV DEBIAN_FRONTEND=noninteractive
RUN apt-get update && \
    apt-get install -y --no-install-recommends ffmpeg g++ make && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /usr/src/app
COPY pyproject.toml README.md ./
COPY whisper_timestamped_tpu ./whisper_timestamped_tpu
COPY native ./native

RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html && \
    pip install --no-cache-dir .

# pre-build the native host components
RUN python -c "from whisper_timestamped_tpu import native; assert native.available()"

COPY tests ./tests

ENTRYPOINT ["whisper_timestamped_tpu"]
