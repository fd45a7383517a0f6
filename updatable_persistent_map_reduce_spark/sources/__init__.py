from .sink import (  # noqa: F401
    write_bucketed,
    write_packed_shards,
    write_partitioned,
)
from .tables import TABLE_NAMES, Catalog, load_table, spread  # noqa: F401
