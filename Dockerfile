# smb-vision-tpu container (role of the reference's CUDA Dockerfile:1-48,
# rebased on TPU): JAX with the libtpu PJRT plugin instead of
# torch+flash-attn wheels.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make zlib1g-dev git \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY smb_vision_tpu ./smb_vision_tpu
COPY csrc ./csrc
COPY scripts ./scripts
COPY configs ./configs

# TPU runtime: jax[tpu] pulls the matching libtpu
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir -e ".[data]"

# native CT loader
RUN python scripts/build_native.py

ENTRYPOINT ["python", "-m"]
CMD ["smb_vision_tpu.cli.run_mim", "--help"]
