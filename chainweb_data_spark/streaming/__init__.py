from .listen import TABLE_PKS, listen_stream, merge_batch

__all__ = ["TABLE_PKS", "listen_stream", "merge_batch"]
