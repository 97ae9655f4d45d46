"""OpenAI-compatible text-embedding client."""

from scintirete_tpu.embedding.client import EmbeddingClient, RateCounter  # noqa: F401
