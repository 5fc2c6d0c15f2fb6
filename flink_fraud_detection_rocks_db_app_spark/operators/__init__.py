"""Operator modules; importing this package populates the query registry."""

from . import (  # noqa: F401
    skew,
    sqlapi,
    asof,
    dedup,
    detectors,
    layout,
    multimodal,
    olap,
    pipeline,
    pq,
    relational,
    retrieval,
    sampling,
    similarity,
    stateful,
    streamface,
    text,
    timeseries,
    tpch,
    windows,
)
