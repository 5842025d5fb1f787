"""Embedding backends: the seam between the host pipeline and compute.

Same plugin shape as the reference's ``speaker_detection_backends``
(``EmbeddingBackend`` ABC base.py:22-200, YAML registry base.py:212-304),
but the default backend runs ON DEVICE (``tpu``) instead of calling the
Speechmatics cloud; ``fake`` is the deterministic test backend that plays
the role of the reference's mocked-cloud tier.
"""

from .base import (
    EmbeddingBackend,
    get_backend,
    list_backends,
    register_backend,
    reload_backends_config,
)

__all__ = [
    "EmbeddingBackend",
    "get_backend",
    "list_backends",
    "register_backend",
    "reload_backends_config",
]
