from .exprs import q_avg, q_sum, q_sum_term  # noqa: F401
from .text import (  # noqa: F401
    normalize_quarter_col,
    quality_score_col,
    token_count_col,
)
from .vectors import cosine_similarity_col, dot_product_col  # noqa: F401
