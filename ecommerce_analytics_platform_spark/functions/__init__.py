from ecommerce_analytics_platform_spark.functions.compat import (  # noqa: F401
    portable_hash60,
    seeded_hash60,
    dow_sunday0,
    is_weekend,
    epoch_seconds_between,
)
from ecommerce_analytics_platform_spark.functions.text import (  # noqa: F401
    tokens,
    token_count,
    word_shingles,
    char_ngrams,
    quality_features,
    language_scores,
    doc_fingerprint,
)
