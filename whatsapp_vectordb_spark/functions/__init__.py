from whatsapp_vectordb_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot_product,
    euclidean_distance,
    l2_norm,
    l2_normalize,
    similarity_score,
)
from whatsapp_vectordb_spark.functions.text import (  # noqa: F401
    normalize_text,
    tokens,
    word_shingles,
)
