"""Engine layer: multi-database / multi-collection management."""

from scintirete_tpu.engine.collection import Collection  # noqa: F401
from scintirete_tpu.engine.database import Database, Engine  # noqa: F401
