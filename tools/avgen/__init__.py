"""avgen — a minimal AV1 bitstream generator (test infrastructure).

Produces conformant AV1 streams with controlled (or randomized-but-legal)
coding choices, playing the role the Argon conformance vectors play for the
reference (SURVEY.md §4): streams are validated by decoding with the
reference oracle, and the TPU decoder must match the oracle bit-exactly.
"""
