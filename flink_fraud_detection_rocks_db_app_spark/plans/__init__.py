"""Plan-inspection helpers used by tests and perf work."""

from .inspect import explain_str, pushed_filters, read_schema_columns  # noqa: F401
