# helix-tpu engine image (the deployment analog of the reference's
# prebuilt enterprise container; reference runs images with port 8080
# inside, local_runtime.rs:14).
#
# Build:  docker build -t helix-tpu .
# Run:    docker run -p 6969:8080 helix-tpu
# Disk:   docker run -p 6969:8080 -v data:/data helix-tpu --data-dir /data
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*
RUN pip install --no-cache-dir "jax[cpu]" numpy

WORKDIR /app
COPY helix_tpu ./helix_tpu
COPY tools ./tools
COPY pyproject.toml README.md ./

# lint gate (clippy_check.sh analog): a finding fails the image build
RUN python tools/lint.py helix_tpu tools

ENV PYTHONPATH=/app
EXPOSE 8080
ENTRYPOINT ["python", "-m", "helix_tpu.server.http_server", "--port", "8080"]
