"""Server binary: scintirete-tpu-server.

Capability parity with the reference server main
(reference: cmd/scintirete-server/main.go:38-171): flags -config,
-log-level, -profile; composition of engine + persistence + embedding +
auth + observability; recovery on start; gRPC + HTTP + metrics listeners;
SIGINT/SIGTERM graceful shutdown with a final fsync.

TPU twist: -profile starts the JAX profiler trace server (the reference's
pprof analogue, SURVEY.md §5 "Tracing / profiling"); -trace DIR records a
profiler trace to a directory for the server's lifetime (the reference's
`runtime/trace`-to-file flag, cmd/scintirete-server/main.go:60-87).
"""

from __future__ import annotations

import argparse
import signal
import sys
import threading

from scintirete_tpu.config import load_config
from scintirete_tpu.errors import ScintireteError
from scintirete_tpu.observability.audit import AuditLogger
from scintirete_tpu.observability.logger import StructuredLogger
from scintirete_tpu.observability.metrics import MetricsRegistry, MetricsServer
from scintirete_tpu.observability.monitor import SystemMonitor


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="scintirete-tpu-server",
        description="TPU-native vector database server (Scintirete capability parity)",
    )
    parser.add_argument("-config", "--config", default=None, help="TOML config path")
    parser.add_argument(
        "-log-level", "--log-level", dest="log_level", default=None,
        help="override log level (debug/info/warn/error)",
    )
    parser.add_argument(
        "-profile", "--profile", type=int, default=0, metavar="PORT",
        help="start the JAX profiler trace server on PORT (0 = off)",
    )
    parser.add_argument(
        "-trace", "--trace", default=None, metavar="DIR",
        help="record a JAX profiler trace to DIR for the server's lifetime "
        "(reference -trace analogue; view with TensorBoard/XProf)",
    )
    parser.add_argument(
        "--no-device", action="store_true",
        help="host-only mode (no TPU dispatch); for development",
    )
    args = parser.parse_args(argv)

    try:
        cfg = load_config(args.config)
    except ScintireteError as exc:
        # reference main.go: bad config is a one-line fatal, not a traceback
        print(f"failed to load config: {exc}", file=sys.stderr)
        return 1
    if args.log_level:
        cfg.log.level = args.log_level
    logger = StructuredLogger.from_config(cfg.log)

    if cfg.tpu.platform:
        # before ANY backend touch (env vars alone don't switch platforms
        # here — the environment pins one via sitecustomize)
        import jax

        jax.config.update("jax_platforms", cfg.tpu.platform)
        logger.info("jax platform override", platform=cfg.tpu.platform)

    if args.profile:
        import jax

        jax.profiler.start_server(args.profile)
        logger.info("jax profiler trace server started", port=args.profile)

    trace_active = False
    if args.trace:
        import jax

        jax.profiler.start_trace(args.trace)
        trace_active = True
        logger.info("jax profiler trace recording", dir=args.trace)

    import os

    audit = AuditLogger(
        path=os.path.join(cfg.persistence.data_dir, "audit.log"),
        enabled=cfg.log.enable_audit_log,
    )
    metrics = MetricsRegistry()

    from scintirete_tpu.server.grpc_server import GrpcServer
    from scintirete_tpu.server.http_server import HttpGateway
    from scintirete_tpu.server.service import ScintireteService

    if not args.no_device:
        # persistent XLA compile cache FIRST (before any backend touch):
        # without it every server restart recompiles all kernel variants
        # from scratch — tens of seconds to minutes EACH over a tunneled
        # TPU — instead of loading cached executables
        from scintirete_tpu.utils import enable_compilation_cache, prewarm

        enable_compilation_cache()
        # pay TPU backend init + the first-transfer channel setup while
        # recovery replays the AOF/RDB (it is 18-77 s over a tunneled
        # TPU and would otherwise land inside the first client request)
        prewarm.warm_runtime_async()

    service = ScintireteService(
        cfg,
        logger=logger,
        audit=audit,
        metrics=metrics,
        use_device=not args.no_device,
    )
    recovery = service.start()
    logger.info("recovery", **recovery)

    grpc_server = GrpcServer(service, cfg.server.grpc_host, cfg.server.grpc_port)
    grpc_server.start()
    logger.info("gRPC listening", address=f"{cfg.server.grpc_host}:{grpc_server.port}")

    http_gateway = HttpGateway(service, cfg.server.http_host, cfg.server.http_port)
    http_gateway.start()
    logger.info(
        "HTTP listening", address=f"{cfg.server.http_host}:{http_gateway.port}"
    )

    metrics_server = None
    if cfg.observability.metrics_enabled:
        metrics_server = MetricsServer(
            metrics,
            cfg.server.http_host,
            cfg.observability.metrics_port,
            cfg.observability.metrics_path,
        )
        metrics_server.start()
        logger.info("metrics listening", port=metrics_server.port)

    monitor = SystemMonitor(
        logger,
        interval_seconds=cfg.monitoring.interval,
        cpu_threshold=cfg.monitoring.cpu_threshold,
        memory_threshold_bytes=cfg.monitoring.memory_threshold * 1024 * 1024,
        enabled=cfg.monitoring.enabled,
        # --no-device must hold: HBM sampling calls jax.devices(), which
        # would initialize (and seize) the single TPU from the monitor
        # thread even in host-only mode
        sample_device=not args.no_device,
        cpu_enabled=cfg.monitoring.cpu_enabled,
        memory_enabled=cfg.monitoring.memory_enabled,
        disk_enabled=cfg.monitoring.disk_enabled,
        disk_threshold_bytes=cfg.monitoring.disk_threshold * 1024 * 1024,
        disk_path=cfg.persistence.data_dir,
    )
    monitor.start()

    stop_event = threading.Event()

    def handle_signal(signum, frame):
        logger.info("shutdown signal received", signal=signum)
        stop_event.set()

    signal.signal(signal.SIGINT, handle_signal)
    signal.signal(signal.SIGTERM, handle_signal)

    stop_event.wait()
    if trace_active:
        import jax

        jax.profiler.stop_trace()
        logger.info("jax profiler trace written", dir=args.trace)
    monitor.stop()
    grpc_server.stop()
    http_gateway.stop()
    if metrics_server:
        metrics_server.stop()
    service.stop()  # persistence stop -> final fsync
    logger.info("server stopped")
    return 0


if __name__ == "__main__":
    sys.exit(main())
