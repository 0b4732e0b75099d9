"""Column-function library: one import surface for the engine's scalar
helpers, plus SQL registration so ``spark.sql`` users get the same
functions.

The reference has no function registry (its extension points are the
validator dict and a vestigial ``add_validator``,
``/root/reference/src/flycatcher/fields.py:291-292``); this package is
a scale extension. Three tiers, fastest first:

1. **Column helpers** (re-exported here from ``operators/``): plain
   Catalyst expressions — whole-stage-codegen'd, the default choice.
2. **SQL temp functions** (:func:`register_sql`): the same expressions
   declared via ``CREATE TEMPORARY FUNCTION … RETURN <expr>`` — still
   pure Catalyst (no Python round-trip), callable from ``spark.sql``.
3. **UDTFs** (:mod:`.chunk`): table-valued transforms for shapes SQL
   expressions can't return; Arrow-batched.
"""

from ..operators.dedup import hamming64, jaccard_words, minhash_signature, word_shingles
from ..operators.similarity import cosine, dot, norm
from ..operators.text import (
    bpe_ish_token_count,
    char_count,
    digit_ratio,
    fingerprint,
    lang_id,
    mean_token_length,
    normalize_text,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)
from .chunk import ChunkTokens, chunk_documents
from .sql import register_sql

__all__ = [
    # text
    "tokens", "token_count", "bpe_ish_token_count", "char_count",
    "stopword_ratio", "punct_ratio", "digit_ratio", "mean_token_length",
    "quality_score", "lang_id", "normalize_text", "fingerprint",
    # vectors
    "dot", "norm", "cosine",
    # hashing / dedup scalars
    "word_shingles", "minhash_signature", "hamming64", "jaccard_words",
    # chunking
    "chunk_documents", "ChunkTokens",
    # registration
    "register_sql",
]
