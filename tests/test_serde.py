"""Binary serde codec: ndarray extension, nested structures, edge dtypes."""

import numpy as np
import pytest

from scintirete_tpu.persistence import serde


class TestSerde:
    def test_ndarray_roundtrip_dtypes(self):
        for dtype in (np.float32, np.int32, np.int64, np.uint64, np.bool_):
            arr = np.array([[1, 0], [0, 1]], dtype=dtype)
            out = serde.loads(serde.dumps({"a": arr}))["a"]
            assert out.dtype == arr.dtype
            np.testing.assert_array_equal(out, arr)

    def test_non_contiguous(self):
        arr = np.arange(20, dtype=np.float32).reshape(4, 5)[:, ::2]
        out = serde.loads(serde.dumps(arr))
        np.testing.assert_array_equal(out, arr)

    def test_numpy_scalars(self):
        data = {"i": np.int64(7), "f": np.float32(1.5), "b": np.bool_(True)}
        out = serde.loads(serde.dumps(data))
        assert out == {"i": 7, "f": 1.5, "b": True}

    def test_nested_structures(self):
        data = {"l": [1, {"x": np.zeros(3, np.float32)}], "s": "text", "n": None}
        out = serde.loads(serde.dumps(data))
        assert out["s"] == "text" and out["n"] is None
        np.testing.assert_array_equal(out["l"][1]["x"], np.zeros(3))

    def test_unserializable_rejected(self):
        with pytest.raises(TypeError):
            serde.dumps({"fn": lambda: None})

    def test_writable_result(self):
        # loaded arrays must be mutable (graph import mutates them)
        out = serde.loads(serde.dumps(np.ones(4, np.float32)))
        out[0] = 5.0
