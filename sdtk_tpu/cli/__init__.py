"""CLI shims reproducing the reference toolkit's command surface.

One module per reference tool, same subcommands and core flags:
detection (speaker_detection), catalog (speaker-catalog), samples
(speaker_samples), segments (speaker_segments), assign (speaker-assign),
report (speaker-report), process (speaker-process), review
(speaker-review), llm (speaker-llm), plus the new ``diarize``.

Conventions carried over (reference SURVEY.md §5.5): data to stdout,
status messages to stderr, ``-q/--quiet`` everywhere, JSON via
``--format json``.
"""
