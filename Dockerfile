# scintirete-tpu server image (reference analogue: Dockerfile — multi-stage
# Go build; here a Python/JAX image with the C++ native engine prebuilt).
#
# Build:  docker build -t scintirete-tpu .
# Run:    docker run -p 9090:9090 -p 8080:8080 -v $PWD/data:/data scintirete-tpu
#
# For real TPU serving use a TPU VM base image providing libtpu; this default
# base serves on CPU (same code path, jax[cpu]).

FROM python:3.12-slim AS build

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ protobuf-compiler && rm -rf /var/lib/apt/lists/*

WORKDIR /src
COPY pyproject.toml README.md ./
COPY scintirete_tpu ./scintirete_tpu
RUN pip install --no-cache-dir "jax[cpu]" grpcio protobuf msgpack numpy \
    && pip install --no-cache-dir .

# precompile the native link engine into the image
ENV SCINTIRETE_NATIVE_CACHE=/opt/scintirete/native
RUN python -c "from scintirete_tpu.native.build import load_native; \
    assert load_native() is not None, 'native build failed'"

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*
COPY --from=build /usr/local/lib/python3.12/site-packages /usr/local/lib/python3.12/site-packages
COPY --from=build /usr/local/bin/scintirete-tpu-* /usr/local/bin/
COPY --from=build /opt/scintirete/native /opt/scintirete/native
COPY configs/scintirete-tpu.template.toml /etc/scintirete/config.toml

ENV SCINTIRETE_NATIVE_CACHE=/opt/scintirete/native
VOLUME /data
EXPOSE 9090 8080 9100

ENTRYPOINT ["scintirete-tpu-server"]
CMD ["-config", "/etc/scintirete/config.toml"]
