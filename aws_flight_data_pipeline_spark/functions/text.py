"""Text-analysis Column builders for the LLM-training-data operators.

All pure Catalyst expressions (no Python UDFs): tokenization, counting,
language-marker heuristics, fingerprints, MinHash signatures via higher-order
array functions. Per-row computation means zero shuffle until the final
aggregate — the property that makes these viable over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space split, matching the corpus)."""
    return F.split(text, " ")


def word_count(text: Column) -> Column:
    """Token count via space-count arithmetic — exact for single-spaced text
    and engine-portable (no split-semantics edge cases)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    )


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def occurrence_count(text: Column, marker: str) -> Column:
    """How many times ``marker`` occurs in ``text`` (overlap-free), via
    length arithmetic — the portable replacement for regexp_count."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit("")))) / len(marker)
    ).cast("bigint")


def token_type_ratio(text: Column) -> Column:
    """Lexical diversity: distinct tokens / total tokens."""
    return distinct_token_count(text).cast("double") / word_count(text).cast("double")


def bpe_ish_token_estimate(text: Column, chars_per_token: float = 4.0) -> Column:
    """BPE-style token-count estimate (~4 chars/token heuristic)."""
    return F.ceil(F.length(text) / F.lit(chars_per_token))


def fingerprint(text: Column) -> Column:
    """Exact-dedup fingerprint: md5 of normalized text (engine-portable)."""
    return F.md5(F.lower(F.trim(text)))


def prefix_fingerprint(text: Column, n_tokens: int = 5) -> Column:
    """Fingerprint of the first ``n_tokens`` tokens — catches docs that share
    an opening (near-dup candidate generator)."""
    return F.md5(F.concat_ws(" ", F.slice(tokens(text), 1, n_tokens)))


def minhash_signature(token_array: Column, num_hashes: int = 8) -> Column:
    """MinHash signature as an array of ``num_hashes`` md5-derived minima.

    Hash family i is ``md5(token || i)``; the signature element is the
    lexicographic minimum over the document's distinct tokens. Pure per-row
    higher-order-function computation: transform(seq, i ->
    array_min(transform(tokens, t -> md5(t || i)))) — no shuffle, no UDF,
    and md5 makes it bit-identical across engines for oracle checks.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(token_array, lambda t: F.md5(F.concat(t, i.cast("string"))))
        ),
    )


def minhash_band(signature: Column, start: int, length: int) -> Column:
    """LSH band key: md5 of a contiguous signature slice. Documents sharing a
    band key are near-dup candidates (standard MinHash-LSH banding)."""
    return F.md5(F.concat_ws("|", F.slice(signature, start + 1, length)))
