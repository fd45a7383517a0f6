from .view import MapReduceView  # noqa: F401
