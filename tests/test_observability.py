"""Observability tests (reference tier: internal/observability tests)."""

import io
import json
import os

import pytest

from scintirete_tpu.observability.audit import AuditLogger, hash_user_id
from scintirete_tpu.observability.logger import StructuredLogger
from scintirete_tpu.observability.monitor import SystemMonitor


class TestLogger:
    def test_json_format(self):
        buf = io.StringIO()
        log = StructuredLogger(level="debug", fmt="json", stream=buf)
        log.info("hello", a=1, b="x")
        record = json.loads(buf.getvalue())
        assert record["msg"] == "hello" and record["a"] == 1 and record["level"] == "info"

    def test_text_format(self):
        buf = io.StringIO()
        log = StructuredLogger(level="info", fmt="text", stream=buf)
        log.warn("watch out", code=7)
        line = buf.getvalue()
        assert "[WARN] watch out" in line and "code=7" in line

    def test_level_filtering(self):
        buf = io.StringIO()
        log = StructuredLogger(level="warn", fmt="json", stream=buf)
        log.debug("no")
        log.info("no")
        log.error("yes")
        lines = buf.getvalue().strip().splitlines()
        assert len(lines) == 1
        assert json.loads(lines[0])["level"] == "error"

    def test_with_fields_child(self):
        buf = io.StringIO()
        log = StructuredLogger(level="info", fmt="json", stream=buf)
        child = log.with_fields(request_id="r1")
        child.info("op")
        assert json.loads(buf.getvalue())["request_id"] == "r1"

    def test_invalid_config_rejected(self):
        with pytest.raises(ValueError):
            StructuredLogger(level="verbose")
        with pytest.raises(ValueError):
            StructuredLogger(fmt="xml")


class TestAudit:
    def test_events_written(self, tmp_path):
        path = str(tmp_path / "audit.log")
        audit = AuditLogger(path=path, enabled=True)
        audit.log_operation("Insert", database="db", collection="c",
                            user_id=hash_user_id("pw"), metadata={"n": 3})
        audit.log_security("Auth", user_id="anonymous")
        audit.close()
        lines = [json.loads(x) for x in open(path)]
        assert lines[0]["level"] == "OPERATION" and lines[0]["metadata"]["n"] == 3
        assert lines[1]["level"] == "SECURITY"
        assert lines[0]["user_id"] == hash_user_id("pw")

    def test_disabled_writes_nothing(self, tmp_path):
        path = str(tmp_path / "audit.log")
        audit = AuditLogger(path=path, enabled=False)
        audit.log_operation("X")
        assert not os.path.exists(path) or os.path.getsize(path) == 0

    def test_rotation(self, tmp_path):
        path = str(tmp_path / "audit.log")
        audit = AuditLogger(path=path, enabled=True, max_size_bytes=500, max_files=3)
        for i in range(30):
            audit.log_operation("Op", metadata={"i": i, "pad": "x" * 50})
        audit.close()
        rotated = [f for f in os.listdir(tmp_path) if f.startswith("audit.log.")]
        assert rotated, "expected rotated files"
        assert len(rotated) <= 2  # max_files - 1 rotations kept

    def test_hash_user_id(self):
        assert hash_user_id("") == "anonymous"
        h = hash_user_id("secret")
        assert len(h) == 16 and h != "secret"
        assert hash_user_id("secret") == h  # deterministic


class TestMonitor:
    def test_sample_shape(self):
        log = StructuredLogger(level="error", fmt="json", stream=io.StringIO())
        mon = SystemMonitor(log, sample_device=False)
        sample = mon.sample_once()
        assert sample["rss_bytes"] > 0
        assert "cpu_utilization" in sample
        assert sample["threads"] >= 1

    def test_threshold_warnings(self):
        buf = io.StringIO()
        log = StructuredLogger(level="warn", fmt="json", stream=buf)
        mon = SystemMonitor(
            log, memory_threshold_bytes=1, cpu_threshold=1e9, sample_device=False
        )
        mon.sample_once()
        warnings = [json.loads(x) for x in buf.getvalue().strip().splitlines()]
        assert any("memory" in w["msg"] for w in warnings)

    def test_start_stop_disabled(self):
        log = StructuredLogger(level="error", fmt="json", stream=io.StringIO())
        mon = SystemMonitor(log, enabled=False)
        mon.start()  # no-op when disabled
        assert mon._thread is None
        mon.stop()


class TestLabelEscaping:
    def test_hostile_label_values_escaped(self):
        from scintirete_tpu.observability.metrics import MetricsRegistry

        reg = MetricsRegistry()
        reg.requests_total.inc(collection='a"b\\c\nd')
        text = reg.expose_text()
        line = next(
            ln for ln in text.splitlines()
            if ln.startswith("scintirete_requests_total{")
        )
        assert '\\"' in line and "\\\\" in line and "\\n" in line
        assert "\n" not in line  # the raw newline never leaks into the line


class TestMonitorKnobs:
    def test_interval_clamped_and_flags_honored(self, tmp_path):
        from scintirete_tpu.observability.logger import StructuredLogger
        from scintirete_tpu.observability.monitor import SystemMonitor

        warns = []

        class L(StructuredLogger):
            def warn(self, msg, **kw):
                warns.append(msg)

        mon = SystemMonitor(
            L("warn"), interval_seconds=0,  # would busy-spin unclamped
            cpu_threshold=0.0001, memory_threshold_bytes=1,
            cpu_enabled=False, memory_enabled=False,
            disk_enabled=True, disk_threshold_bytes=1,
            disk_path=str(tmp_path), sample_device=False,
        )
        assert mon.interval >= 1.0
        stats = mon.sample_once()
        assert "disk_used_bytes" in stats
        # cpu/memory warnings suppressed by their flags; disk fires
        assert warns == ["disk usage above threshold"]
