from ecommerce_analytics_platform_spark.operators.dedup import (  # noqa: F401
    dedup_latest,
    dedup_exact,
    minhash_lsh_pairs,
)
from ecommerce_analytics_platform_spark.operators.sessionize import (  # noqa: F401
    rollup_sessions,
    sessionize_by_gap,
)
from ecommerce_analytics_platform_spark.operators.calendar import build_dim_date  # noqa: F401
from ecommerce_analytics_platform_spark.operators.similarity import (  # noqa: F401
    cosine_topk_bruteforce,
)
