"""On-device diarization clustering: affinity → spectral embedding → k-means,
plus host AHC fallback and DER metrics.

This capability goes beyond the reference toolkit, which trusts the STT
vendor's diarization labels and never re-diarizes raw audio (SURVEY.md §7
step 7; BASELINE.json config 3 makes it a requirement here).
"""

from .affinity import cosine_affinity, refine_affinity
from .ahc import ahc_labels
from .der import diarization_error_rate
from .spectral import spectral_cluster

__all__ = [
    "cosine_affinity",
    "refine_affinity",
    "spectral_cluster",
    "ahc_labels",
    "diarization_error_rate",
]
