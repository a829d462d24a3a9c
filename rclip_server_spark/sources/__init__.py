from . import external, matview, writer
from .catalog import (
    TABLES,
    load_table,
    load_tables,
    load_words_table,
    project_dynamic,
    register_views,
)

__all__ = ["TABLES", "load_table", "load_tables", "load_words_table", "register_views", "project_dynamic", "writer", "external", "matview"]
