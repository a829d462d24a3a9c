from . import external, writer
from .catalog import TABLES, load_table, load_tables, project_dynamic, register_views

__all__ = ["TABLES", "load_table", "load_tables", "register_views", "project_dynamic", "writer", "external"]
