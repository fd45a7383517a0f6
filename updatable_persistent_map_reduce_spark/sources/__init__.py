from .tables import TABLE_NAMES, Catalog, load_table, spread  # noqa: F401
