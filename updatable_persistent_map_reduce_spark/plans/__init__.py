from .store import (  # noqa: F401
    ConcurrentCommitError,
    ManifestTable,
    retry_commit,
)
from .view import MapReduceView  # noqa: F401
