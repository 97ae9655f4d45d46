"""Multi-chip scaling: sharded indexes over a jax.sharding.Mesh."""

from scintirete_tpu.parallel.sharded import (  # noqa: F401
    ShardedFlatIndex,
    ShardedHNSWIndex,
    make_default_mesh,
)
