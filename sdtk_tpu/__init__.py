"""sdtk_tpu — TPU-native speaker diarization framework.

A ground-up rebuild of the capabilities of CLIAI/speaker-diarization-toolkit
(reference mounted at /root/reference) as one importable Python package with a
JAX/XLA/Pallas compute core:

- ``sdtk_tpu.store``       file database (profiles, catalog, samples,
                           assignments, queue) — reference L0/L2
- ``sdtk_tpu.transcripts`` AssemblyAI / Speechmatics transcript parsing —
                           reference ``speaker_detection_backends/transcript.py``
- ``sdtk_tpu.backends``    embedding-backend protocol + registry — reference
                           ``speaker_detection_backends/base.py``; the default
                           backend here runs ON DEVICE instead of calling the
                           Speechmatics cloud
- ``sdtk_tpu.ops``         device kernels: log-mel frontend, batched cosine
                           scoring, eigensolver (Pallas / XLA)
- ``sdtk_tpu.models``      ECAPA-TDNN / x-vector embedding towers (flax)
- ``sdtk_tpu.cluster``     affinity + spectral clustering + DER metrics
- ``sdtk_tpu.parallel``    device meshes, sharding rules, multi-chip steps
- ``sdtk_tpu.pipeline``    identify/assign/diarize/report/process engines
- ``sdtk_tpu.cli``         thin CLI shims with the reference's command surface

Heavy imports (jax, flax) are deferred: importing ``sdtk_tpu`` itself or the
host-side layers (store/transcripts/cli) never pulls in JAX.
"""

__version__ = "0.1.0"

SCHEMA_VERSION = 1  # speaker profile schema (reference speaker_detection:36)
SAMPLE_METADATA_VERSION = 2  # sample metadata schema (reference migrations.py:30)
