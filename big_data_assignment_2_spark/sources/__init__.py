from .io import TABLES, load_table, load_tables, register_views  # noqa: F401
