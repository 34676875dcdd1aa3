# DeepIPR-TPU runtime image (packaging parity with the reference's Dockerfile;
# the reference shipped a CUDA torch image, this targets TPU VMs).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml requirements.txt ./
# On TPU VMs use the libtpu wheel: pip install 'jax[tpu]' -f \
#   https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir jax flax optax orbax-checkpoint numpy pillow

COPY deepipr_tpu ./deepipr_tpu
COPY native ./native
COPY passport_configs ./passport_configs
COPY lr_configs ./lr_configs
COPY train_v1.py train_v23.py bench.py ./
COPY passport_attack_1.py passport_attack_2.py passport_attack_3.py \
     pruning_attack.py flip_attack.py ./
COPY tools ./tools

RUN pip install --no-cache-dir --no-deps --no-build-isolation -e .

ENTRYPOINT ["python"]
CMD ["train_v23.py", "--help"]
