from .tables import TABLES, load_table, load_tables, normalize_event_time, register_views

__all__ = ["TABLES", "load_table", "load_tables", "normalize_event_time", "register_views"]
