"""Source connectors for the engine."""

from .rate import rate_transactions  # noqa: F401
from .kafka import kafka_transactions  # noqa: F401
from .pydatasource import (  # noqa: F401
    FraudTransactionsDataSource,
    register_fraud_source,
)
from .files import (  # noqa: F401
    csv_transactions,
    jsonl_documents,
    quarantine,
)
