"""Operator modules; importing this package populates the query registry."""

from . import (  # noqa: F401
    dedup,
    detectors,
    multimodal,
    relational,
    similarity,
    stateful,
    text,
    windows,
)
