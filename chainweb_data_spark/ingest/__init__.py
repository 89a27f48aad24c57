from .transforms import (
    payload_to_tables,
    blocks_from_raw,
    transactions_from_raw,
    events_from_raw,
    transfers_from_events,
    signers_from_raw,
    minerkeys_from_raw,
)
from .fetch import (
    ApiError,
    FetchPolicy,
    FetchReport,
    classify_status,
    fetch_range,
    raw_df_from_report,
    run_fetch_plan,
)

__all__ = [
    "ApiError",
    "FetchPolicy",
    "FetchReport",
    "classify_status",
    "fetch_range",
    "raw_df_from_report",
    "run_fetch_plan",
    "payload_to_tables",
    "blocks_from_raw",
    "transactions_from_raw",
    "events_from_raw",
    "transfers_from_events",
    "signers_from_raw",
    "minerkeys_from_raw",
]
