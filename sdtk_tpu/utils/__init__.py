"""Host-side utilities: hashing, atomic IO, audio decode."""
