from flink_spark.functions.scalar import (  # noqa: F401
    dec2,
    dec4,
    dsum,
    multi_if,
    to_hour,
    to_yyyymmdd,
)
from flink_spark.functions.text import (  # noqa: F401
    fingerprint,
    normalize_text,
    tokenize,
    word_shingles,
)
