from .listen import TABLE_PKS, listen_stream, merge_batch
from .publish import publish_batch, read_manifest, read_published, vacuum

__all__ = [
    "TABLE_PKS",
    "listen_stream",
    "merge_batch",
    "publish_batch",
    "read_manifest",
    "read_published",
    "vacuum",
]
