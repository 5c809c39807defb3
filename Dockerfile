# TPU-VM training image.
# Build on a Cloud TPU VM base; jax[tpu] links against libtpu.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ git make && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt \
    && pip install --no-cache-dir "jax[tpu]" \
       -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY . .
# Pre-build the native transformation kernel
RUN python -c "from dvs_of_training_framework_tpu import native; \
               assert native._load() is not None"

ENV INSIDE_DOCKER=1
ENTRYPOINT ["python3", "train_flownet.py"]
