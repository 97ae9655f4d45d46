"""CLI tests against a live in-process gRPC server (SURVEY.md §4 CLI tier)."""

import numpy as np
import pytest

from scintirete_tpu.cli.main import CLI
from scintirete_tpu.config import Config
from scintirete_tpu.server.grpc_server import GrpcClient, GrpcServer
from scintirete_tpu.server.service import ScintireteService

PASSWORD = "pw"


@pytest.fixture
def cli(tmp_path):
    cfg = Config()
    cfg.server.passwords = [PASSWORD]
    cfg.persistence.data_dir = str(tmp_path / "data")
    svc = ScintireteService(cfg, use_device=False)
    svc.start()
    server = GrpcServer(svc, port=0)
    server.start()
    client = GrpcClient(f"127.0.0.1:{server.port}", timeout=10)
    yield CLI(client, PASSWORD)
    client.close()
    server.stop()
    svc.stop()


class TestCLI:
    def test_ping_and_version(self, cli):
        assert cli.execute("ping").startswith("PONG")
        assert "scintirete-tpu-cli" in cli.execute("version")

    def test_help(self, cli):
        out = cli.execute("help")
        for cmd in ("database", "collection", "vector", "text", "save", "bgsave"):
            assert cmd in out

    def test_full_workflow(self, cli, rng):
        assert "created" in cli.execute("database create mydb")
        assert "mydb" in cli.execute("database list")
        cli.execute("use mydb")
        assert "created" in cli.execute("collection create vecs L2 8 50")
        out = cli.execute("collection info vecs")
        assert "m=8" in out and "metric=L2" in out

        v = rng.standard_normal(4).round(3).tolist()
        out = cli.execute(f"vector insert vecs '{v}' '{{\"tag\": \"x\"}}'")
        assert "inserted id=1" in out
        out = cli.execute(f"vector search vecs '{v}' 1")
        assert "id=1" in out and '"tag": "x"' in out
        assert "deleted 1" in cli.execute("vector delete vecs 1")
        assert "(no results)" in cli.execute(f"vector search vecs '{v}' 1")

        assert "saved" in cli.execute("save")
        assert "background save" in cli.execute("bgsave")
        assert "dropped" in cli.execute("collection drop vecs")
        assert "dropped" in cli.execute("database drop mydb")

    def test_quickstart_lines_verbatim(self, cli):
        """The docs/quickstart.md REPL session must work typed as-is:
        JSON arrays with spaces and unquoted {"k": "v"} metadata (shlex
        would shred the array and strip the JSON double quotes)."""
        cli.execute("database create demo")
        cli.execute("use demo")
        cli.execute("collection create docs COSINE")
        out = cli.execute(
            'vector insert docs [0.1, 0.2, 0.3, 0.4] {"title": "hello"}'
        )
        assert "inserted id=1" in out
        out = cli.execute(
            'vector insert docs [0.9, 0.8, 0.7, 0.6] {"title": "world"}'
        )
        assert "inserted id=2" in out
        out = cli.execute("vector search docs [0.1, 0.2, 0.3, 0.4] 2")
        assert "id=1" in out and '"title": "hello"' in out

    def test_split_command_edge_cases(self):
        from scintirete_tpu.cli.main import split_command

        assert split_command('a "b c" d') == ["a", "b c", "d"]
        assert split_command("a '[1, 2]'") == ["a", "[1, 2]"]
        # bracket inside a JSON string must not end the token
        assert split_command('x [1, {"a": "]"}] y') == [
            "x", '[1, {"a": "]"}]', "y"
        ]
        # unterminated JSON runs to end of line (error surfaces in json.loads)
        assert split_command("x [1, 2") == ["x", "[1, 2"]
        assert split_command("") == []

    def test_requires_db_selection(self, cli):
        with pytest.raises(ValueError, match="no database selected"):
            cli.execute("collection list")

    def test_unknown_command(self, cli):
        with pytest.raises(ValueError, match="unknown command"):
            cli.execute("frobnicate")

    def test_bad_metric(self, cli):
        cli.execute("database create db")
        cli.execute("use db")
        with pytest.raises(ValueError, match="metric"):
            cli.execute("collection create c HAMMING")


@pytest.fixture
def cli_with_embedding(tmp_path):
    from tests.test_api import FakeEmbeddingServer
    from scintirete_tpu.config import EmbeddingModel

    fake = FakeEmbeddingServer()
    cfg = Config()
    cfg.server.passwords = [PASSWORD]
    cfg.persistence.data_dir = str(tmp_path / "data")
    cfg.embedding.base_url = fake.url
    cfg.embedding.api_key = "k"
    cfg.embedding.default_model = "fake-model"
    cfg.embedding.models = [
        EmbeddingModel(id="fake-model", name="Fake", dimension=8, available=True)
    ]
    svc = ScintireteService(cfg, use_device=False)
    svc.start()
    server = GrpcServer(svc, port=0)
    server.start()
    client = GrpcClient(f"127.0.0.1:{server.port}", timeout=10)
    yield CLI(client, PASSWORD)
    client.close()
    server.stop()
    svc.stop()
    fake.stop()


class TestCLIText:
    def test_text_models(self, cli_with_embedding):
        out = cli_with_embedding.execute("text models")
        assert "fake-model" in out
        assert "default: fake-model" in out

    def test_text_insert_and_search(self, cli_with_embedding):
        cli = cli_with_embedding
        cli.execute("database create db")
        cli.execute("use db")
        cli.execute("collection create docs COSINE")
        out = cli.execute("text insert docs 'hello world' '{\"lang\": \"en\"}'")
        assert "inserted id=1" in out
        out = cli.execute("text search docs 'hello world' 1")
        assert "id=1" in out and '"lang": "en"' in out
