from .store import (  # noqa: F401
    ConcurrentCommitError,
    ManifestTable,
    retry_commit,
)
from .join_view import JoinView  # noqa: F401
from .view import MapReduceView  # noqa: F401
