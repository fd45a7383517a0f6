from .store import ConcurrentCommitError, ManifestTable  # noqa: F401
from .view import MapReduceView  # noqa: F401
