from .tables import TABLE_NAMES, Catalog, load_table  # noqa: F401
