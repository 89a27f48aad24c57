from .transforms import (
    payload_to_tables,
    blocks_from_raw,
    transactions_from_raw,
    events_from_raw,
    transfers_from_events,
    signers_from_raw,
    minerkeys_from_raw,
)

__all__ = [
    "payload_to_tables",
    "blocks_from_raw",
    "transactions_from_raw",
    "events_from_raw",
    "transfers_from_events",
    "signers_from_raw",
    "minerkeys_from_raw",
]
