"""Host-side engines orchestrating store + backends + device compute:

- ``identify``  enroll / identify / verify (reference speaker_detection)
- ``assign``    multi-signal fusion (reference speaker-assign)
- ``diarize``   full re-diarization: windows → embeddings → clustering
- ``report``    health metrics (reference speaker-report)
- ``process``   batch queue driver (reference speaker-process)
- ``llm``       LLM name detection (reference speaker-llm)
- ``review``    review session core (reference speaker-review)
"""
