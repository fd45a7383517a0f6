from .bucket import NUM_BUCKETS, bucket_expr, bucket_sql  # noqa: F401
from .text import tokens_expr, shingles_expr  # noqa: F401
from .vectors import cosine_expr, dot_expr, l2_norm_expr  # noqa: F401
