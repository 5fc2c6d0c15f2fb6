"""Source connectors for the engine."""

from .rate import rate_transactions  # noqa: F401
from .kafka import kafka_transactions  # noqa: F401
from .pydatasource import (  # noqa: F401
    FraudTransactionsDataSource,
    register_fraud_source,
)
from .files import (  # noqa: F401
    avro_available,
    binary_corpus,
    csv_transactions,
    jsonl_documents,
    quarantine,
    read_avro,
    read_orc,
    text_corpus,
    write_orc,
)
