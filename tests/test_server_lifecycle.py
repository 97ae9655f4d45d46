"""Whole-server lifecycle smoke test (reference tier: test/integration_test.go
— real process start, serve, graceful SIGTERM shutdown with final fsync,
restart with recovery)."""

import json
import os
import signal
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

import pytest

PASSWORD = "lifecycle-pw"


def free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def http(port, path, method="GET", body=None, token=PASSWORD):
    headers = {"Content-Type": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, method=method, headers=headers
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        return json.loads(resp.read().decode())


@pytest.fixture
def server_env(tmp_path):
    grpc_port, http_port = free_port(), free_port()
    config = tmp_path / "server.toml"
    config.write_text(
        f"""
[server]
grpc_port = {grpc_port}
http_port = {http_port}
passwords = ["{PASSWORD}"]
[log]
enable_audit_log = true
[persistence]
data_dir = "{tmp_path}/data"
aof_sync_strategy = "always"
[observability]
metrics_enabled = false
"""
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    def start():
        proc = subprocess.Popen(
            [
                sys.executable, "-m", "scintirete_tpu.cli.server_main",
                "-config", str(config), "--no-device",
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                http(http_port, "/api/v1/health", token=None)
                return proc
            except (urllib.error.URLError, ConnectionError, OSError):
                if proc.poll() is not None:
                    out = proc.stdout.read().decode(errors="replace")
                    raise AssertionError(f"server died at startup:\n{out}")
                time.sleep(0.2)
        proc.kill()
        raise AssertionError("server did not become healthy in 30s")

    yield start, http_port


class TestServerLifecycle:
    def test_serve_sigterm_recover(self, server_env):
        start, port = server_env
        proc = start()
        try:
            http(port, "/api/v1/databases", "POST", {"name": "db"})
            http(
                port,
                "/api/v1/databases/db/collections",
                "POST",
                {"collection_name": "c", "metric_type": "L2"},
            )
            resp = http(
                port,
                "/api/v1/databases/db/collections/c/vectors",
                "POST",
                {
                    "vectors": [
                        {"elements": [float(i), 1.0, 0.0, -1.0], "metadata": {"i": i}}
                        for i in range(8)
                    ]
                },
            )
            assert resp["inserted_count"] == 8
        finally:
            # graceful shutdown: final AOF fsync happens here
            proc.send_signal(signal.SIGTERM)
            assert proc.wait(timeout=15) == 0

        # restart: AOF-only recovery (no snapshot was taken)
        proc2 = start()
        try:
            resp = http(
                port,
                "/api/v1/databases/db/collections/c/search",
                "POST",
                {"query_vector": [3.0, 1.0, 0.0, -1.0], "top_k": 1},
            )
            assert int(resp["results"][0]["id"]) == 4
            assert resp["results"][0]["metadata"]["i"] == 3
            health = http(port, "/api/v1/health", token=None)
            assert health["stats"]["vectors"] == 8
        finally:
            proc2.send_signal(signal.SIGTERM)
            assert proc2.wait(timeout=15) == 0
