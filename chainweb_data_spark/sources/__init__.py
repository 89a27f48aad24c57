from .maintenance import compact_table, migrate_flat_to_bucketed
from .schema_check import check_store, check_table_schema
from .tables import TESTDATA_TABLES, load_table, load_tables, register_views

__all__ = [
    "TESTDATA_TABLES",
    "check_store",
    "check_table_schema",
    "compact_table",
    "load_table",
    "load_tables",
    "migrate_flat_to_bucketed",
    "register_views",
]
