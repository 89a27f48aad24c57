from .maintenance import compact_table, migrate_flat_to_bucketed
from .tables import TESTDATA_TABLES, load_table, load_tables, register_views

__all__ = [
    "TESTDATA_TABLES",
    "compact_table",
    "load_table",
    "load_tables",
    "migrate_flat_to_bucketed",
    "register_views",
]
