"""API-layer tests: core service RPCs, gRPC transport, HTTP gateway, embedding
client against a local fake (SURVEY.md §4 tiers "Integration — servers" and
"Fixtures/fakes")."""

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from scintirete_tpu.config import Config, EmbeddingModel
from scintirete_tpu.embedding import EmbeddingClient
from scintirete_tpu.errors import ErrorCode, ScintireteError
from scintirete_tpu.proto import scintirete_pb2 as pb
from scintirete_tpu.server.service import ScintireteService, dict_to_struct

PASSWORD = "test-password"


# ----- fake OpenAI-compatible embedding server (like net/http/httptest) -----


class FakeEmbeddingServer:
    """Deterministic embeddings: hash of the text seeds a small vector."""

    def __init__(self, dim=8, fail_with=None):
        self.dim = dim
        self.requests = []
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                length = int(self.headers.get("Content-Length") or 0)
                body = json.loads(self.rfile.read(length))
                outer.requests.append(
                    {"body": body, "auth": self.headers.get("Authorization")}
                )
                if fail_with is not None:
                    self.send_response(fail_with)
                    self.send_header("Content-Length", "2")
                    self.end_headers()
                    self.wfile.write(b"{}")
                    return
                data = []
                for i, text in enumerate(body["input"]):
                    rng = np.random.default_rng(abs(hash(text)) % (2**32))
                    data.append(
                        {
                            "index": i,
                            "embedding": rng.standard_normal(outer.dim).tolist(),
                        }
                    )
                payload = json.dumps(
                    {"data": data, "usage": {"total_tokens": 3}}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *args):
                pass

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}/v1/embeddings"
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture
def fake_embed():
    server = FakeEmbeddingServer()
    yield server
    server.stop()


@pytest.fixture
def service(tmp_path, fake_embed):
    cfg = Config()
    cfg.server.passwords = [PASSWORD]
    cfg.persistence.data_dir = str(tmp_path / "data")
    cfg.embedding.base_url = fake_embed.url
    cfg.embedding.api_key = "test-key"
    cfg.embedding.default_model = "fake-model"
    cfg.embedding.models = [
        EmbeddingModel(id="fake-model", name="Fake", dimension=8, available=True)
    ]
    svc = ScintireteService(cfg, use_device=False)
    svc.start()
    yield svc
    svc.stop()


def auth(password=PASSWORD):
    return pb.AuthInfo(password=password)


def setup_collection(svc, db="db", col="c", metric=pb.L2):
    svc.CreateDatabase(pb.CreateDatabaseRequest(auth=auth(), name=db))
    svc.CreateCollection(
        pb.CreateCollectionRequest(
            auth=auth(), db_name=db, collection_name=col, metric_type=metric
        )
    )


class TestAuth:
    def test_wrong_password_rejected(self, service):
        with pytest.raises(ScintireteError) as exc:
            service.ListDatabases(pb.ListDatabasesRequest(auth=auth("nope")))
        assert exc.value.code == ErrorCode.UNAUTHORIZED

    def test_empty_password_rejected(self, service):
        with pytest.raises(ScintireteError):
            service.ListDatabases(pb.ListDatabasesRequest())

    def test_correct_password(self, service):
        resp = service.ListDatabases(pb.ListDatabasesRequest(auth=auth()))
        assert list(resp.names) == []


class TestDatabaseRPCs:
    def test_create_list_drop(self, service):
        resp = service.CreateDatabase(
            pb.CreateDatabaseRequest(auth=auth(), name="db1")
        )
        assert resp.success
        assert list(
            service.ListDatabases(pb.ListDatabasesRequest(auth=auth())).names
        ) == ["db1"]
        drop = service.DropDatabase(pb.DropDatabaseRequest(auth=auth(), name="db1"))
        assert drop.success

    def test_duplicate_create_fails(self, service):
        service.CreateDatabase(pb.CreateDatabaseRequest(auth=auth(), name="db"))
        with pytest.raises(ScintireteError) as exc:
            service.CreateDatabase(pb.CreateDatabaseRequest(auth=auth(), name="db"))
        assert exc.value.code == ErrorCode.DATABASE_ALREADY_EXISTS


class TestCollectionRPCs:
    def test_create_with_custom_hnsw(self, service):
        service.CreateDatabase(pb.CreateDatabaseRequest(auth=auth(), name="db"))
        resp = service.CreateCollection(
            pb.CreateCollectionRequest(
                auth=auth(),
                db_name="db",
                collection_name="c",
                metric_type=pb.COSINE,
                hnsw_config=pb.HnswConfig(m=24, ef_construction=111),
            )
        )
        assert resp.info.hnsw_config.m == 24
        assert resp.info.hnsw_config.ef_construction == 111
        assert resp.info.metric_type == pb.COSINE

    def test_custom_hnsw_keeps_server_defaults(self, tmp_path, fake_embed):
        """Regression: hnsw_config must not drop server-default fields the
        proto doesn't expose (neighbor_heuristic), and the AOF CREATE record
        must carry them so replay rebuilds with the same selection rule."""
        cfg = Config()
        cfg.server.passwords = [PASSWORD]
        cfg.persistence.data_dir = str(tmp_path / "data")
        cfg.algorithm.hnsw_defaults.neighbor_heuristic = True
        svc = ScintireteService(cfg, use_device=False)
        svc.start()
        try:
            svc.CreateDatabase(pb.CreateDatabaseRequest(auth=auth(), name="db"))
            svc.CreateCollection(
                pb.CreateCollectionRequest(
                    auth=auth(), db_name="db", collection_name="c",
                    metric_type=pb.COSINE,
                    hnsw_config=pb.HnswConfig(m=24, ef_construction=111),
                )
            )
            col = svc.engine.get_database("db").get_collection("c")
            assert col.config.hnsw.neighbor_heuristic is True
            assert col.config.hnsw.m == 24
        finally:
            svc.stop()
        # replayed collection keeps the heuristic
        svc2 = ScintireteService(cfg, use_device=False)
        svc2.start()  # start() runs recovery (AOF replay)
        try:
            col2 = svc2.engine.get_database("db").get_collection("c")
            assert col2.config.hnsw.neighbor_heuristic is True
            assert col2.config.hnsw.m == 24
        finally:
            svc2.stop()

    def test_search_prewarm_on_restart(self, tmp_path):
        """A restarted server warms every restored collection's search
        programs in the background (the first client query must not absorb
        per-shape program loads)."""
        import numpy as np

        cfg = Config()
        cfg.server.passwords = [PASSWORD]
        cfg.persistence.data_dir = str(tmp_path / "data")
        cfg.tpu.search_batch_size = 32
        svc = ScintireteService(cfg, use_device=True)
        svc.start()
        try:
            svc.CreateDatabase(pb.CreateDatabaseRequest(auth=auth(), name="db"))
            svc.CreateCollection(
                pb.CreateCollectionRequest(
                    auth=auth(), db_name="db", collection_name="c",
                    metric_type=pb.COSINE,
                )
            )
            col = svc.engine.get_database("db").get_collection("c")
            rng = np.random.default_rng(0)
            col.insert([(v, None) for v in
                        rng.standard_normal((50, 8)).astype(np.float32)])
            svc.Save(pb.SaveRequest(auth=auth()))
        finally:
            svc.stop()
        svc2 = ScintireteService(cfg, use_device=True)
        svc2.start()
        try:
            assert svc2._warm_thread is not None
            svc2._warm_thread.join(timeout=120)
            assert svc2._warm_info is not None
            assert svc2._warm_info["programs"] == len(svc2._warm_info["widths"])
            assert svc2._warm_info["widths"] == [8, 16, 32]
        finally:
            svc2.stop()

    def test_unspecified_metric_rejected(self, service):
        service.CreateDatabase(pb.CreateDatabaseRequest(auth=auth(), name="db"))
        with pytest.raises(ScintireteError):
            service.CreateCollection(
                pb.CreateCollectionRequest(
                    auth=auth(), db_name="db", collection_name="c"
                )
            )

    def test_info_and_list(self, service):
        setup_collection(service)
        infos = service.ListCollections(
            pb.ListCollectionsRequest(auth=auth(), db_name="db")
        )
        assert len(infos.collections) == 1
        info = service.GetCollectionInfo(
            pb.GetCollectionInfoRequest(
                auth=auth(), db_name="db", collection_name="c"
            )
        )
        assert info.name == "c"
        assert info.vector_count == 0


class TestVectorRPCs:
    def test_insert_search_delete_flow(self, service, rng):
        setup_collection(service)
        vecs = rng.standard_normal((10, 8)).astype(np.float32)
        req = pb.InsertVectorsRequest(auth=auth(), db_name="db", collection_name="c")
        for i, v in enumerate(vecs):
            vec = pb.Vector(elements=v.tolist())
            vec.metadata.CopyFrom(dict_to_struct({"i": i}))
            req.vectors.append(vec)
        resp = service.InsertVectors(req)
        assert resp.inserted_count == 10
        ids = list(resp.inserted_ids)
        assert ids == list(range(1, 11))

        sresp = service.Search(
            pb.SearchRequest(
                auth=auth(),
                db_name="db",
                collection_name="c",
                query_vector=vecs[3].tolist(),
                top_k=3,
            )
        )
        assert sresp.results[0].id == 4
        assert not sresp.results[0].HasField("vector")  # include_vector defaults false
        assert sresp.results[0].metadata.fields["i"].number_value == 3

        sresp2 = service.Search(
            pb.SearchRequest(
                auth=auth(),
                db_name="db",
                collection_name="c",
                query_vector=vecs[3].tolist(),
                top_k=1,
                include_vector=True,
            )
        )
        assert sresp2.results[0].HasField("vector")
        np.testing.assert_allclose(
            list(sresp2.results[0].vector.elements), vecs[3], rtol=1e-6
        )

        dresp = service.DeleteVectors(
            pb.DeleteVectorsRequest(
                auth=auth(), db_name="db", collection_name="c", ids=[4, 999]
            )
        )
        assert dresp.deleted_count == 1
        sresp3 = service.Search(
            pb.SearchRequest(
                auth=auth(),
                db_name="db",
                collection_name="c",
                query_vector=vecs[3].tolist(),
                top_k=3,
            )
        )
        assert all(r.id != 4 for r in sresp3.results)

    def test_validation_errors(self, service):
        setup_collection(service)
        with pytest.raises(ScintireteError):
            service.Search(
                pb.SearchRequest(
                    auth=auth(), db_name="db", collection_name="c", top_k=5
                )
            )
        with pytest.raises(ScintireteError):
            service.Search(
                pb.SearchRequest(
                    auth=auth(),
                    db_name="db",
                    collection_name="c",
                    query_vector=[1.0],
                    top_k=0,
                )
            )
        with pytest.raises(ScintireteError) as exc:
            service.Search(
                pb.SearchRequest(
                    auth=auth(),
                    db_name="db",
                    collection_name="missing",
                    query_vector=[1.0],
                    top_k=5,
                )
            )
        assert exc.value.code == ErrorCode.COLLECTION_NOT_FOUND


class TestEmbeddingRPCs:
    def test_embed_text(self, service, fake_embed):
        resp = service.EmbedText(
            pb.EmbedTextRequest(auth=auth(), texts=["hello", "world"])
        )
        assert len(resp.results) == 2
        assert resp.results[0].text == "hello"
        assert len(resp.results[0].embedding) == 8
        assert fake_embed.requests[0]["auth"] == "Bearer test-key"
        assert fake_embed.requests[0]["body"]["model"] == "fake-model"

    def test_embed_and_insert_then_search(self, service):
        setup_collection(service, metric=pb.COSINE)
        req = pb.EmbedAndInsertRequest(auth=auth(), db_name="db", collection_name="c")
        for text in ["alpha", "beta", "gamma"]:
            t = pb.TextWithMetadata(text=text)
            t.metadata.CopyFrom(dict_to_struct({"text": text}))
            req.texts.append(t)
        resp = service.EmbedAndInsert(req)
        assert resp.inserted_count == 3

        sresp = service.EmbedAndSearch(
            pb.EmbedAndSearchRequest(
                auth=auth(),
                db_name="db",
                collection_name="c",
                query_text="alpha",
                top_k=1,
            )
        )
        # the fake embedder is deterministic per text: "alpha" finds itself
        assert sresp.results[0].metadata.fields["text"].string_value == "alpha"

    def test_list_models(self, service):
        resp = service.ListEmbeddingModels(pb.ListEmbeddingModelsRequest(auth=auth()))
        assert resp.default_model == "fake-model"
        assert resp.models[0].dimension == 8


class TestPersistenceRPCs:
    def test_save_and_recovery(self, service, tmp_path, fake_embed, rng):
        setup_collection(service)
        vecs = rng.standard_normal((5, 8)).astype(np.float32)
        req = pb.InsertVectorsRequest(auth=auth(), db_name="db", collection_name="c")
        for v in vecs:
            req.vectors.append(pb.Vector(elements=v.tolist()))
        service.InsertVectors(req)
        resp = service.Save(pb.SaveRequest(auth=auth()))
        assert resp.success
        assert resp.snapshot_size > 0

        # new service over the same data dir recovers everything
        svc2 = ScintireteService(service.config, use_device=False)
        result = svc2.start()
        assert result["rdb_loaded"] is True
        info = svc2.GetCollectionInfo(
            pb.GetCollectionInfoRequest(
                auth=auth(), db_name="db", collection_name="c"
            )
        )
        assert info.vector_count == 5
        svc2.stop()

    def test_bgsave(self, service):
        resp = service.BgSave(pb.BgSaveRequest(auth=auth()))
        assert resp.success
        assert len(resp.job_id) == 12

    def test_recovery_replays_aof_without_snapshot(self, service, rng):
        setup_collection(service)
        vecs = rng.standard_normal((4, 8)).astype(np.float32)
        req = pb.InsertVectorsRequest(auth=auth(), db_name="db", collection_name="c")
        for v in vecs:
            req.vectors.append(pb.Vector(elements=v.tolist()))
        service.InsertVectors(req)
        service.persistence.aof.flush()

        svc2 = ScintireteService(service.config, use_device=False)
        result = svc2.start()
        assert result["rdb_loaded"] is False
        assert result["aof_commands"] == 3  # create db, create col, insert
        info = svc2.GetCollectionInfo(
            pb.GetCollectionInfoRequest(
                auth=auth(), db_name="db", collection_name="c"
            )
        )
        assert info.vector_count == 4
        svc2.stop()


class TestMetricsWiring:
    def test_requests_counted(self, service):
        service.ListDatabases(pb.ListDatabasesRequest(auth=auth()))
        assert service.metrics.requests_total.get(method="ListDatabases") == 1
        text = service.metrics.expose_text()
        assert "scintirete_requests_total" in text

    def test_errors_counted(self, service):
        with pytest.raises(ScintireteError):
            service.ListDatabases(pb.ListDatabasesRequest(auth=auth("bad")))
        assert service.metrics.request_errors_total.get(method="ListDatabases") == 1


class TestEmbeddingClientUnit:
    def _config(self, url, **kw):
        from scintirete_tpu.config import EmbeddingConfig

        return EmbeddingConfig(base_url=url, api_key="k", default_model="m", **kw)

    def test_http_error_mapped(self):
        server = FakeEmbeddingServer(fail_with=500)
        try:
            client = EmbeddingClient(self._config(server.url))
            with pytest.raises(ScintireteError) as exc:
                client.get_embeddings(["x"])
            assert exc.value.code == ErrorCode.EMBEDDING_API_FAILED
        finally:
            server.stop()

    def test_unreachable_mapped(self):
        client = EmbeddingClient(
            self._config("http://127.0.0.1:1/v1/embeddings"), timeout_seconds=0.5
        )
        with pytest.raises(ScintireteError) as exc:
            client.get_embeddings(["x"])
        assert exc.value.code == ErrorCode.EMBEDDING_TIMEOUT

    def test_rate_limit_enforced(self):
        server = FakeEmbeddingServer()
        try:
            client = EmbeddingClient(self._config(server.url, rpm_limit=2))
            client.get_embeddings(["a"])
            client.get_embeddings(["b"])
            with pytest.raises(ScintireteError) as exc:
                client.get_embeddings(["c"])
            assert exc.value.code == ErrorCode.EMBEDDING_QUOTA_EXCEEDED
        finally:
            server.stop()

    def test_empty_input(self, fake_embed):
        client = EmbeddingClient(self._config(fake_embed.url))
        assert client.get_embeddings([]) == []


class TestRateLimiting:
    """Request-abuse control (reference declares the RateLimiter interface,
    interfaces.go:265-278; here it is wired into every RPC)."""

    def test_token_bucket_unit(self):
        from scintirete_tpu.server.ratelimit import TokenBucketLimiter

        lim = TokenBucketLimiter(rps=100.0, burst=3)
        for _ in range(3):
            lim.allow("u")
        with pytest.raises(ScintireteError) as exc:
            lim.allow("u")
        assert exc.value.code == ErrorCode.RATE_LIMITED
        lim.allow("other-key")  # buckets are per key
        assert lim.get_limit("u") == (100.0, 3.0)
        lim.set_limit("u", 0, 0)  # per-key unlimited override
        for _ in range(10):
            lim.allow("u")

    def test_disabled_by_default(self):
        from scintirete_tpu.server.ratelimit import TokenBucketLimiter

        lim = TokenBucketLimiter(rps=0)
        for _ in range(1000):
            lim.allow("u")

    def test_service_enforces_limit(self, tmp_path):
        cfg = Config()
        cfg.server.passwords = [PASSWORD]
        cfg.server.rate_limit_rps = 2.0
        cfg.server.rate_limit_burst = 2
        cfg.persistence.data_dir = str(tmp_path / "data")
        svc = ScintireteService(cfg, use_device=False)
        svc.start()
        try:
            svc.ListDatabases(pb.ListDatabasesRequest(auth=auth()))
            svc.ListDatabases(pb.ListDatabasesRequest(auth=auth()))
            with pytest.raises(ScintireteError) as exc:
                svc.ListDatabases(pb.ListDatabasesRequest(auth=auth()))
            assert exc.value.code == ErrorCode.RATE_LIMITED
        finally:
            svc.stop()


class TestEmbeddingRobustness:
    """Malformed embedding-API responses must surface as typed errors
    (EMBEDDING_API_FAILED), never raw JSONDecodeError/TypeError/KeyError."""

    def _client(self, url):
        from scintirete_tpu.config import Config, EmbeddingModel
        from scintirete_tpu.embedding.client import EmbeddingClient

        cfg = Config()
        cfg.embedding.base_url = url
        cfg.embedding.api_key = "k"
        cfg.embedding.default_model = "fake-model"
        cfg.embedding.models = [
            EmbeddingModel(id="fake-model", name="F", dimension=8,
                           available=True)
        ]
        return EmbeddingClient(cfg.embedding)

    @pytest.mark.parametrize("body", [
        b"<html>proxy error</html>",      # not JSON at all
        b'{"data": 123}',                  # unsized truthy data
        b'{"data": [{"nope": 1}]}',        # missing index/embedding keys
        b'[1, 2, 3]',                      # non-dict body
    ])
    def test_malformed_responses_typed(self, body):
        from scintirete_tpu.errors import ErrorCode, ScintireteError

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                length = int(self.headers.get("Content-Length") or 0)
                self.rfile.read(length)
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):
                pass

        httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            client = self._client(
                f"http://127.0.0.1:{httpd.server_address[1]}/v1/embeddings"
            )
            with pytest.raises(ScintireteError) as exc:
                client.get_embeddings(["hello"])
            assert exc.value.code == ErrorCode.EMBEDDING_API_FAILED
        finally:
            httpd.shutdown()
            httpd.server_close()

    def test_metadata_length_mismatch_rejected(self, fake_embed):
        from scintirete_tpu.errors import ScintireteError

        client = self._client(fake_embed.url)
        with pytest.raises(ScintireteError):
            client.texts_to_vectors(["a", "b", "c"], metadatas=[{}, {}])
