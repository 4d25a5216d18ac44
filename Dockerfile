# Ishara-TPU development/serving image (the reference ships a Jupyter image;
# this ships the framework + CLI). For TPU hosts, swap the jax[cpu] extra for
# the libtpu wheel matching your runtime.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/ishara
COPY ishara_tpu ./ishara_tpu
COPY bench.py __graft_entry__.py README.md ./

RUN pip install --no-cache-dir "jax[cpu]" flax optax orbax-checkpoint chex \
        einops numpy pandas pyarrow pytest

ENV PYTHONPATH=/opt/ishara
ENTRYPOINT ["python", "-m", "ishara_tpu"]
CMD ["--help"]
