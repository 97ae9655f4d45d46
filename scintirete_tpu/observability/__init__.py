"""Observability: structured logging, audit log, Prometheus metrics, monitor."""

from scintirete_tpu.observability.logger import StructuredLogger  # noqa: F401
from scintirete_tpu.observability.audit import AuditLogger  # noqa: F401
from scintirete_tpu.observability.metrics import (  # noqa: F401
    Counter,
    Gauge,
    Histogram,
    MetricsRegistry,
    MetricsServer,
)
