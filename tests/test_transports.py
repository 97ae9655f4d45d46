"""Transport tests: gRPC over a real socket, HTTP gateway, metrics server."""

import json
import urllib.error
import urllib.request

import grpc
import numpy as np
import pytest

from scintirete_tpu.config import Config
from scintirete_tpu.observability.metrics import MetricsRegistry, MetricsServer
from scintirete_tpu.proto import scintirete_pb2 as pb
from scintirete_tpu.server.grpc_server import GrpcClient, GrpcServer
from scintirete_tpu.server.http_server import HttpGateway
from scintirete_tpu.server.service import ScintireteService

PASSWORD = "pw"


@pytest.fixture
def service(tmp_path):
    cfg = Config()
    cfg.server.passwords = [PASSWORD]
    cfg.persistence.data_dir = str(tmp_path / "data")
    svc = ScintireteService(cfg, use_device=False)
    svc.start()
    yield svc
    svc.stop()


@pytest.fixture
def grpc_pair(service):
    server = GrpcServer(service, port=0)
    server.start()
    client = GrpcClient(f"127.0.0.1:{server.port}", timeout=10)
    yield client
    client.close()
    server.stop()


@pytest.fixture
def http_gateway(service):
    gw = HttpGateway(service, port=0)
    gw.start()
    yield f"http://127.0.0.1:{gw.port}"
    gw.stop()


def _http(url, method="GET", body=None, token=PASSWORD):
    headers = {"Content-Type": "application/json"}
    if token is not None:
        headers["Authorization"] = f"Bearer {token}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as exc:
        return exc.code, json.loads(exc.read().decode())


class TestGrpcTransport:
    def test_full_flow_over_socket(self, grpc_pair, rng):
        c = grpc_pair
        auth = pb.AuthInfo(password=PASSWORD)
        c.CreateDatabase(pb.CreateDatabaseRequest(auth=auth, name="db"))
        c.CreateCollection(
            pb.CreateCollectionRequest(
                auth=auth, db_name="db", collection_name="col", metric_type=pb.L2
            )
        )
        vecs = rng.standard_normal((6, 4)).astype(np.float32)
        req = pb.InsertVectorsRequest(auth=auth, db_name="db", collection_name="col")
        for v in vecs:
            req.vectors.append(pb.Vector(elements=v.tolist()))
        resp = c.InsertVectors(req)
        assert resp.inserted_count == 6
        sresp = c.Search(
            pb.SearchRequest(
                auth=auth,
                db_name="db",
                collection_name="col",
                query_vector=vecs[2].tolist(),
                top_k=2,
            )
        )
        assert sresp.results[0].id == 3

    def test_error_codes_over_socket(self, grpc_pair):
        c = grpc_pair
        auth = pb.AuthInfo(password=PASSWORD)
        with pytest.raises(grpc.RpcError) as exc:
            c.ListDatabases(pb.ListDatabasesRequest(auth=pb.AuthInfo(password="bad")))
        assert exc.value.code() == grpc.StatusCode.UNAUTHENTICATED
        with pytest.raises(grpc.RpcError) as exc:
            c.DropDatabase(pb.DropDatabaseRequest(auth=auth, name="missing"))
        assert exc.value.code() == grpc.StatusCode.NOT_FOUND
        c.CreateDatabase(pb.CreateDatabaseRequest(auth=auth, name="dup"))
        with pytest.raises(grpc.RpcError) as exc:
            c.CreateDatabase(pb.CreateDatabaseRequest(auth=auth, name="dup"))
        assert exc.value.code() == grpc.StatusCode.ALREADY_EXISTS

    def test_save_over_socket(self, grpc_pair):
        c = grpc_pair
        auth = pb.AuthInfo(password=PASSWORD)
        c.CreateDatabase(pb.CreateDatabaseRequest(auth=auth, name="db"))
        resp = c.Save(pb.SaveRequest(auth=auth))
        assert resp.success

    def test_batch_search_packed(self, grpc_pair, rng):
        """BatchSearch (packed-payload extension): f32 and f16 queries in,
        packed u64 ids / f32 distances out, agreeing with plain Search."""
        c = grpc_pair
        auth = pb.AuthInfo(password=PASSWORD)
        c.CreateDatabase(pb.CreateDatabaseRequest(auth=auth, name="db"))
        c.CreateCollection(
            pb.CreateCollectionRequest(
                auth=auth, db_name="db", collection_name="col",
                metric_type=pb.L2,
            )
        )
        vecs = rng.standard_normal((32, 8)).astype(np.float32)
        req = pb.InsertVectorsRequest(
            auth=auth, db_name="db", collection_name="col"
        )
        for v in vecs:
            req.vectors.append(pb.Vector(elements=v.tolist()))
        c.InsertVectors(req)

        queries = vecs[:5]
        resp = c.BatchSearch(
            pb.BatchSearchRequest(
                auth=auth, db_name="db", collection_name="col",
                queries_packed=queries.tobytes(), num_queries=5, dim=8,
                top_k=3,
            )
        )
        assert resp.num_queries == 5 and resp.top_k == 3
        ids = np.frombuffer(resp.ids_packed, np.uint64).reshape(5, 3)
        dists = np.frombuffer(resp.distances_packed, np.float32).reshape(5, 3)
        # self-query: own id first at distance ~0
        assert list(ids[:, 0]) == [1, 2, 3, 4, 5]
        assert np.allclose(dists[:, 0], 0, atol=1e-2)
        # agrees with the reference-compatible Search RPC
        s = c.Search(
            pb.SearchRequest(
                auth=auth, db_name="db", collection_name="col",
                query_vector=queries[3].tolist(), top_k=3,
            )
        )
        assert [r.id for r in s.results] == list(ids[3])

        # f16 payload round-trips (query dtype only; results stay f32)
        resp16 = c.BatchSearch(
            pb.BatchSearchRequest(
                auth=auth, db_name="db", collection_name="col",
                queries_packed=queries.astype(np.float16).tobytes(),
                num_queries=5, dim=8, top_k=3, dtype="f16",
            )
        )
        ids16 = np.frombuffer(resp16.ids_packed, np.uint64).reshape(5, 3)
        assert list(ids16[:, 0]) == [1, 2, 3, 4, 5]

        # size-mismatch payload is INVALID_ARGUMENT
        with pytest.raises(grpc.RpcError) as exc:
            c.BatchSearch(
                pb.BatchSearchRequest(
                    auth=auth, db_name="db", collection_name="col",
                    queries_packed=b"\x00" * 10, num_queries=5, dim=8,
                    top_k=3,
                )
            )
        assert exc.value.code() == grpc.StatusCode.INVALID_ARGUMENT


class TestHttpGateway:
    def test_health_no_auth(self, http_gateway):
        status, body = _http(f"{http_gateway}/api/v1/health", token=None)
        assert status == 200
        assert body["status"] == "healthy"

    def test_auth_required(self, http_gateway):
        status, body = _http(f"{http_gateway}/api/v1/databases", token=None)
        assert status == 401
        status, body = _http(f"{http_gateway}/api/v1/databases", token="wrong")
        assert status == 401

    def test_full_flow(self, http_gateway, rng):
        base = http_gateway
        status, body = _http(
            f"{base}/api/v1/databases", "POST", {"name": "db"}
        )
        assert status == 200 and body["success"]
        status, body = _http(
            f"{base}/api/v1/databases/db/collections",
            "POST",
            {"collection_name": "col", "metric_type": "COSINE"},
        )
        assert status == 200 and body["success"]

        vecs = rng.standard_normal((4, 4)).astype(np.float32)
        status, body = _http(
            f"{base}/api/v1/databases/db/collections/col/vectors",
            "POST",
            {
                "vectors": [
                    {"elements": v.tolist(), "metadata": {"i": i}}
                    for i, v in enumerate(vecs)
                ]
            },
        )
        assert status == 200
        assert body["inserted_count"] == 4

        status, body = _http(
            f"{base}/api/v1/databases/db/collections/col/search",
            "POST",
            {"query_vector": vecs[1].tolist(), "top_k": 2},
        )
        assert status == 200
        assert int(body["results"][0]["id"]) == 2
        assert body["results"][0]["metadata"]["i"] == 1

        status, body = _http(f"{base}/api/v1/databases")
        assert body["names"] == ["db"]

        status, body = _http(
            f"{base}/api/v1/databases/db/collections/col/vectors",
            "DELETE",
            {"ids": ["2"]},
        )
        assert status == 200 and body["deleted_count"] == 1

    def test_error_status_mapping(self, http_gateway):
        status, body = _http(
            f"{http_gateway}/api/v1/databases/missing/collections/x", "GET"
        )
        assert status == 404
        assert body["code"] == 3000
        status, body = _http(f"{http_gateway}/api/v1/nope")
        assert status == 404

    def test_invalid_json_400(self, http_gateway):
        req = urllib.request.Request(
            f"{http_gateway}/api/v1/databases",
            data=b"{not json",
            method="POST",
            headers={
                "Authorization": f"Bearer {PASSWORD}",
                "Content-Type": "application/json",
            },
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=10)
        assert exc.value.code == 400

    def test_cors_preflight(self, http_gateway):
        req = urllib.request.Request(
            f"{http_gateway}/api/v1/databases", method="OPTIONS"
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            assert resp.status == 204
            assert resp.headers["Access-Control-Allow-Origin"] == "*"


class TestMetricsServer:
    def test_exposition(self):
        registry = MetricsRegistry()
        registry.requests_total.inc(method="Search")
        server = MetricsServer(registry, port=0)
        server.start()
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/metrics", timeout=5
            ) as resp:
                text = resp.read().decode()
            assert 'scintirete_requests_total{method="Search"} 1' in text
            assert "scintirete_uptime_seconds" in text
            with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/health", timeout=5
            ) as resp:
                assert json.loads(resp.read())["status"] == "ok"
        finally:
            server.stop()
