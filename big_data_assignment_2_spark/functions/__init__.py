from .text import (  # noqa: F401
    TOKEN_STRIP_PATTERN,
    char_poly_hash,
    normalize_whitespace,
    tokenize,
    tokenize_query,
)
from .scoring import bm25_term_score, idf_plain  # noqa: F401
