"""Tests for the shared types, error codes, and config loader (SURVEY.md §2.7, L0/X1)."""

import textwrap

import pytest

from scintirete_tpu.config import load_config
from scintirete_tpu.errors import ErrorCode, ScintireteError
from scintirete_tpu.types import (
    CollectionConfig,
    DistanceMetric,
    HNSWParams,
)


class TestDistanceMetric:
    def test_parse_aliases(self):
        assert DistanceMetric.parse("l2") == DistanceMetric.L2
        assert DistanceMetric.parse("Euclidean") == DistanceMetric.L2
        assert DistanceMetric.parse("COSINE") == DistanceMetric.COSINE
        assert DistanceMetric.parse("ip") == DistanceMetric.INNER_PRODUCT
        assert DistanceMetric.parse(2) == DistanceMetric.COSINE
        assert DistanceMetric.parse(DistanceMetric.L2) == DistanceMetric.L2

    def test_parse_unknown(self):
        with pytest.raises(ValueError):
            DistanceMetric.parse("hamming")


class TestHNSWParams:
    def test_defaults_match_reference(self):
        # reference: pkg/types/types.go:104-112
        p = HNSWParams()
        assert (p.m, p.ef_construction, p.ef_search, p.max_layers) == (16, 200, 50, 16)

    def test_validate_rejects_bad(self):
        with pytest.raises(ScintireteError) as exc:
            HNSWParams(m=0).validate()
        assert exc.value.code == ErrorCode.INVALID_PARAMETER

    def test_seed_resolution(self):
        assert HNSWParams(seed=42).resolved_seed() == 42
        assert HNSWParams().resolved_seed() > 0


class TestCollectionConfig:
    def test_valid(self):
        CollectionConfig(name="c", metric=DistanceMetric.L2).validate()

    def test_rejects_unspecified_metric(self):
        with pytest.raises(ScintireteError):
            CollectionConfig(name="c", metric=DistanceMetric.UNSPECIFIED).validate()

    def test_rejects_empty_name(self):
        with pytest.raises(ScintireteError):
            CollectionConfig(name="").validate()

    def test_rejects_bad_dtype(self):
        with pytest.raises(ScintireteError):
            CollectionConfig(name="c", device_dtype="int4").validate()


class TestErrors:
    def test_code_contract(self):
        # numeric contract from reference internal/utils/errors.go:12-51
        assert int(ErrorCode.INTERNAL) == 1000
        assert int(ErrorCode.UNAUTHORIZED) == 2000
        assert int(ErrorCode.DATABASE_NOT_FOUND) == 3000
        assert int(ErrorCode.DIMENSION_MISMATCH) == 3005
        assert int(ErrorCode.PERSISTENCE_FAILED) == 4000
        assert int(ErrorCode.INDEX_BUILD_FAILED) == 5000
        assert int(ErrorCode.EMBEDDING_API_FAILED) == 6000

    def test_category(self):
        assert ScintireteError(ErrorCode.UNAUTHORIZED, "x").category == "auth"
        assert ScintireteError(ErrorCode.CORRUPTED_DATA, "x").category == "persistence"

    def test_to_dict(self):
        e = ScintireteError(ErrorCode.DIMENSION_MISMATCH, "bad", {"expected": 4})
        d = e.to_dict()
        assert d["code"] == 3005 and d["details"]["expected"] == 4


class TestConfig:
    def test_defaults_validate(self):
        cfg = load_config(None)
        assert cfg.server.grpc_port == 9090
        assert cfg.algorithm.hnsw_defaults.m == 16

    def test_load_reference_style_toml(self, tmp_path):
        toml = textwrap.dedent(
            """
            [server]
            grpc_port = 19090
            http_port = 18080
            passwords = ["pw1", "pw2"]

            [log]
            level = "debug"
            format = "text"
            enable_audit_log = true

            [persistence]
            data_dir = "./data"
            aof_sync_strategy = "always"

            [embedding]
            default_model = "text-embedding-3-small"

            [[embedding.models]]
            id = "text-embedding-3-small"
            name = "small"
            dimension = 1536
            available = true

            [algorithm.hnsw_defaults]
            m = 32
            ef_construction = 100
            ef_search = 64

            [tpu]
            device_dtype = "bfloat16"
            """
        )
        path = tmp_path / "cfg.toml"
        path.write_text(toml)
        cfg = load_config(str(path))
        assert cfg.server.grpc_port == 19090
        assert cfg.server.passwords == ["pw1", "pw2"]
        assert cfg.log.enable_audit_log is True
        assert cfg.persistence.aof_sync_strategy == "always"
        assert cfg.persistence.data_dir.startswith(str(tmp_path))
        assert cfg.embedding.models[0].dimension == 1536
        assert cfg.default_hnsw_params().m == 32
        assert cfg.tpu.device_dtype == "bfloat16"

    def test_unknown_keys_ignored(self, tmp_path):
        path = tmp_path / "cfg.toml"
        path.write_text("[server]\nfuture_knob = 1\n")
        load_config(str(path))

    def test_invalid_values_rejected(self, tmp_path):
        path = tmp_path / "cfg.toml"
        path.write_text('[log]\nlevel = "verbose"\n')
        with pytest.raises(ScintireteError) as exc:
            load_config(str(path))
        assert exc.value.code == ErrorCode.CONFIG

    def test_missing_file(self):
        with pytest.raises(ScintireteError):
            load_config("/nonexistent/cfg.toml")


class TestConfigHardening:
    def test_wrong_typed_value_is_config_error(self, tmp_path):
        from scintirete_tpu.config import load_config
        from scintirete_tpu.errors import ErrorCode, ScintireteError

        p = tmp_path / "c.toml"
        p.write_text('[server]\ngrpc_port = "9090"\n')
        with pytest.raises(ScintireteError) as exc:
            load_config(str(p))
        assert exc.value.code == ErrorCode.CONFIG

    def test_monitoring_interval_validated(self, tmp_path):
        from scintirete_tpu.config import load_config
        from scintirete_tpu.errors import ErrorCode, ScintireteError

        p = tmp_path / "c.toml"
        p.write_text("[monitoring]\nenabled = true\ninterval = 0\n")
        with pytest.raises(ScintireteError) as exc:
            load_config(str(p))
        assert exc.value.code == ErrorCode.CONFIG
