"""Embedding towers (flax.linen): ECAPA-TDNN (flagship) and x-vector.

These replace the reference's cloud-side speaker model — the opaque
"identifier strings" returned by Speechmatics enrollment
(speechmatics_backend.py:283-359) become real on-device vectors.
"""

from .conformer import Conformer, ConformerConfig
from .ecapa import EcapaConfig, EcapaTdnn
from .xvector import XVector, XVectorConfig

__all__ = [
    "EcapaTdnn", "EcapaConfig", "XVector", "XVectorConfig",
    "Conformer", "ConformerConfig",
]
