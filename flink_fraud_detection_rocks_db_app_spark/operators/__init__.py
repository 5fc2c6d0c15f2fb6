"""Operator modules; importing this package populates the query registry."""

from . import detectors, relational, stateful, windows  # noqa: F401
