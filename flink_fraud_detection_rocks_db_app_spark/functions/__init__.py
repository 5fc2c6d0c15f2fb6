"""Reusable column-expression library (the engine's scalar-function
surface). Everything here is a pure Catalyst expression — JVM-side,
codegen-friendly, usable in batch and streaming alike."""

from .vectors import cosine_similarity, dot, l2_norm, to_double_array  # noqa: F401
from .textfns import normalized_text, whitespace_tokens, word_ngrams  # noqa: F401
