from .cursor import CursorSpec, keyset_predicate, keyset_page, offset_page
from .gaps import detect_gaps
from .search import like_any, like_escape, event_search_predicate, code_search_predicate

__all__ = [
    "CursorSpec",
    "keyset_predicate",
    "keyset_page",
    "offset_page",
    "detect_gaps",
    "like_any",
    "like_escape",
    "event_search_predicate",
    "code_search_predicate",
]
