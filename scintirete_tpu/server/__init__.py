"""API servers: the core service (16 RPCs), gRPC transport, HTTP/JSON gateway."""

from scintirete_tpu.server.auth import BasicAuthenticator  # noqa: F401
from scintirete_tpu.server.service import ScintireteService  # noqa: F401
