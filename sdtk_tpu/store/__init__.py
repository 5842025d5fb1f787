"""File database: the framework's L0 storage layer.

Same on-disk contract as the reference's ``$SPEAKERS_EMBEDDINGS_DIR`` layout
(reference README.md:121-131): ``db/{id}.json`` profiles,
``embeddings/{emb-id}.npy`` dense vectors (the local-backend form the
reference's ABC anticipates at base.py:123-124), ``samples/{speaker}/``,
``catalog/{b3sum}.yaml``, ``assignments/{b3sum}.yaml``, ``contexts.yaml``,
``process_queue.yaml`` — with atomic writes throughout.
"""

from . import assignments, catalog, profiles, queue, samples, schemas
from .migrations import (
    PROFILE_SCHEMA_VERSION,
    SAMPLE_METADATA_VERSION,
    describe_migrations,
    get_migration_plan,
    migrate_profile,
    migrate_sample_metadata,
)

__all__ = [
    "assignments",
    "catalog",
    "profiles",
    "queue",
    "samples",
    "schemas",
    "PROFILE_SCHEMA_VERSION",
    "SAMPLE_METADATA_VERSION",
    "migrate_profile",
    "migrate_sample_metadata",
    "get_migration_plan",
    "describe_migrations",
]
