# Build / test / bench targets (reference: Makefile:47-160 provides the same
# developer surface for the Go original).

PY ?= python

.PHONY: all install proto-gen native test test-fast bench lint clean server cli

all: install native test

install:
	pip install -e . --no-build-isolation --no-deps -q

proto-gen:
	protoc --python_out=scintirete_tpu/proto --proto_path=scintirete_tpu/proto \
		scintirete_tpu/proto/scintirete.proto

native:
	$(PY) -c "from scintirete_tpu.native.build import load_native; \
		lib = load_native(); \
		print('native:', 'ok' if lib else 'UNAVAILABLE (python fallback)')"

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

bench:
	$(PY) bench.py

server:
	scintirete-tpu-server -config configs/scintirete-tpu.template.toml

cli:
	scintirete-tpu-cli

clean:
	rm -rf build dist *.egg-info .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
