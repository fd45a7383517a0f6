"""PySpark-native updatable persistent map-reduce engine.

Public surface:
- :class:`api.MapReduceTask` / :class:`api.Executer` — the reference's
  5-method API shape (MapReduce/MapReduceTask.cs:8-14,
  Executer.cs:13-16,31,370), Spark-native underneath;
- :class:`plans.MapReduceView` — the underlying incremental view;
- :class:`streaming.StreamingMapReduceView` — the streaming twin;
- :mod:`operators` — the full registered query surface.
"""

from .api import Executer, MapReduceTask  # noqa: F401
