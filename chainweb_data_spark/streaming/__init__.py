from .listen import TABLE_PKS, listen_stream, merge_batch
from .publish import publish_batch, read_manifest, read_published, vacuum
from .sse import parse_sse_lines, sse_events_to_raw_rows

__all__ = [
    "TABLE_PKS",
    "listen_stream",
    "merge_batch",
    "parse_sse_lines",
    "sse_events_to_raw_rows",
    "publish_batch",
    "read_manifest",
    "read_published",
    "vacuum",
]
