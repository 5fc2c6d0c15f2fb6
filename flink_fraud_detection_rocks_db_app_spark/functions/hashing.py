"""Engine-portable deterministic hashing for sampling gates.

Knuth multiplicative hash ``(id * 2654435761) mod 2^32`` — a uniform
permutation of the id space using only BIGINT math, spelled so DuckDB
replays it exactly (engine-specific hash functions like xxhash64 are
NOT cross-engine reproducible). The 16-bit split multiply keeps every
intermediate below 2^49 so int64 can never wrap (asserted for random
63-bit ids in tests/test_extensions.py). Only the integer-division
operator differs per engine (Spark ``div``, DuckDB ``//``).

Shared by the sampling gates (operators/sampling.py — splits, rates,
temperature resampling) and the DSIR importance-resampling gate
(operators/text.py); lives here because both modules need it and
sampling already imports text (the shared quality CTEs).
"""

from __future__ import annotations

KNUTH = 2654435761
HASH_MOD = 4294967296  # 2^32

HASH_TMPL = (
    "((((((doc_id % 4294967296) {idiv} 65536) * 2654435761) % 4294967296)"
    " * 65536 + (doc_id % 65536) * 2654435761) % 4294967296)"
)
HASH_SPARK = HASH_TMPL.format(idiv="div")
HASH_DUCK = HASH_TMPL.format(idiv="//")
