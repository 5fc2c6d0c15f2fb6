"""Operator modules; importing this package populates the query registry."""

from . import detectors, relational, windows  # noqa: F401
