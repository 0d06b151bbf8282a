# seekstorm_tpu server image (TPU host)
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY seekstorm_tpu ./seekstorm_tpu
COPY native ./native
COPY README.md .

# jax: pick the wheel matching the target (tpu wheel on TPU VMs)
RUN pip install --no-cache-dir "jax[tpu]" -f \
    https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax

RUN make -C native

ENV MASTER_KEY_SECRET=change_me
EXPOSE 80
CMD ["python", "-m", "seekstorm_tpu.server", "index_path=/data", \
     "local_ip=0.0.0.0", "local_port=80", "--no-console"]
