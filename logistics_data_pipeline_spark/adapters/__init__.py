from .testdata import TABLES, load_table, load_tables, bronze_events, BRONZE_SQL

__all__ = ["TABLES", "load_table", "load_tables", "bronze_events", "BRONZE_SQL"]
