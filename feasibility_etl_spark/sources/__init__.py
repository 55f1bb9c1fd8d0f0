from .catalog import TABLES, load, register_views, schema_for

__all__ = ["TABLES", "load", "register_views", "schema_for"]
