"""Durability: append-only command log (AOF) + point-in-time snapshots (RDB)."""

from scintirete_tpu.persistence.aof import AOFLogger, SyncStrategy  # noqa: F401
from scintirete_tpu.persistence.rdb import RDBManager, BackupManager  # noqa: F401
from scintirete_tpu.persistence.manager import PersistenceManager  # noqa: F401
