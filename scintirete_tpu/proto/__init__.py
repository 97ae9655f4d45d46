"""Generated protobuf bindings (protoc --python_out of scintirete.proto)."""

from scintirete_tpu.proto import scintirete_pb2  # noqa: F401
