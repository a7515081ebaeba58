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


def word_ngrams(text: Column, k: int) -> Column:
    """ALL contiguous k-token word n-grams, in order, WITH multiplicity —
    the repetition-analysis primitive (``shingles`` deduplicates; repetition
    signals need every occurrence). Documents shorter than ``k`` tokens yield
    one truncated gram (slice clamps), matching the shingle convention."""
    tk = tokens(text)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tk) - (k - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(tk, i, k), " "),
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (word k-grams) of the document.

    MinHash over raw unigram tokens degenerates on corpora with a shared
    vocabulary: every document contains the same frequent words, so the
    per-family minimum is usually the hash of a common token and thousands
    of non-duplicate documents collide into one LSH bucket (measured: a
    2520-doc bucket at sf0.1 → 6.2M candidate pairs). k-gram shingles are
    the standard fix — contiguous word sequences are distinctive, so only
    genuinely near-duplicate documents share band minima (same corpus:
    max bucket 4, 453 candidate pairs)."""
    tk = tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tk) - (k - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(tk, i, k), " "),
        )
    )


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


#: Universal-hash family constants for the fast MinHash: h_i(x) = (a_i·x + b_i)
#: mod p with p = 2^31−1. x is reduced mod p first, so a_i·x < 2^62 — no int64
#: overflow in either engine (identical arithmetic, hence identical minima).
MINHASH_P = 2_147_483_647
MINHASH_A = (179424673, 32452843, 86028121, 49979687, 67867967, 15485863, 23456789, 122949829)
MINHASH_B = (7, 101, 1009, 10007, 100003, 1000003, 333667, 999983)


def minhash_nums(token_array: Column) -> Column:
    """ONE md5 digest per element, parsed to int64 (mod p) — the expensive
    stage of the fast MinHash, materialized as its own column so Catalyst
    keeps a single evaluation (CollapseProject will not inline a non-cheap
    alias referenced by every hash family)."""
    return F.transform(
        token_array,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % MINHASH_P,
    )


def minhash_signature_fast(nums: Column, num_hashes: int = 8) -> Column:
    """MinHash signature over pre-hashed elements (:func:`minhash_nums`):
    each family is cheap codegen arithmetic ``(a_i·x + b_i) mod p`` — ~8×
    fewer digest computations than :func:`minhash_signature` at identical
    banding quality. Engine-portable: both Spark (``conv(hex,16,10)``) and
    DuckDB (``('0x'||hex)::BIGINT``) parse the same 15-hex-digit prefix to
    the same integer, and the modular arithmetic is exact int64 in both."""
    a = F.array(*[F.lit(v) for v in MINHASH_A[:num_hashes]])
    b = F.array(*[F.lit(v) for v in MINHASH_B[:num_hashes]])
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                nums,
                lambda x: (
                    F.element_at(a, (i + 1).cast("int")) * x
                    + F.element_at(b, (i + 1).cast("int"))
                )
                % MINHASH_P,
            )
        ),
    )


def token_hashes(text: Column) -> Column:
    """One xxhash64 per whitespace token — the first stage of the hashed
    shingle path. MUST be materialized as its own column before
    :func:`hashed_shingle_nums` consumes it: a lambda that references an
    inline array expression re-evaluates it per element (measured: the
    inlined form ran the x100 signature stage >10x slower than the staged
    one — O(n^2) token hashing)."""
    return F.transform(tokens(text), lambda t: F.xxhash64(t))


def hashed_shingle_nums(th_col: Column, k: int = 3) -> Column:
    """Production shingle path (verdict r11 #4, redesigned after
    measurement): shingle identities WITHOUT k-gram strings. The r11
    per-stage breakdown blamed the dedup pipeline's dominant cost on the
    'md5 signature stage', but swapping only the digest (xxhash64 over the
    same shingle strings) bought 1.06x at the x100 corpus — the real
    constant is building every k-gram STRING (array_join over slices),
    string array_distinct, and a 32-hex digest+conv per shingle. Here each
    shingle's identity is xxhash64 over its k consecutive token hashes (a
    native multi-arg long hash — no string ever materializes), deduped in
    64-bit space, reduced mod p for the universal-hash families. Measured:
    72.1 s -> 3.5 s (20x) on the x100 signature stage. Short docs clamp
    like :func:`shingles` (one truncated shingle via try_element_at NULLs
    — deterministic identity). md5 strings stay the ORACLE tier; this
    family is rows-only/property-pinned (the _xx twin precedent)."""
    return F.transform(
        hashed_shingles(th_col, k), lambda h: F.pmod(h, F.lit(MINHASH_P))
    )


def hashed_shingles(th_col: Column, k: int = 3) -> Column:
    """Distinct RAW 64-bit hashed shingle identities (xxhash64 over k
    consecutive token hashes, short-doc clamped like
    :func:`hashed_shingle_nums`, which layers the mod-p reduction the
    MinHash families need on top of this). Exact-Jaccard consumers
    (``dedup_family_agreement_xx``) use the raw ids directly — the full
    64-bit space keeps the string↔hash shingle mapping injective up to
    birthday collisions (~n²/2⁶⁵, immaterial below trillions of distinct
    shingles)."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(th_col) - (k - 1), F.lit(1)))
    sh = F.transform(
        idx,
        lambda i: F.xxhash64(
            *[F.try_element_at(th_col, (i + j).cast("int")) for j in range(k)]
        ),
    )
    return F.array_distinct(sh)


def minhash_band_xx(signature: Column, start: int, length: int) -> Column:
    """LSH band key via xxhash64 of the signature slice — the production
    twin of :func:`minhash_band` (same banding semantics, 8-byte key
    instead of a 32-char hex string through the candidate shuffle)."""
    return F.xxhash64(F.concat_ws("|", F.slice(signature, start + 1, length)))


def minhash_fast_sql(elements_sql: str, num_hashes: int = 8) -> str:
    """DuckDB mirror of :func:`minhash_signature_fast` over a SQL list
    expression — used by oracles so signature VALUES are verified."""
    a = "[" + ", ".join(str(v) for v in MINHASH_A[:num_hashes]) + "]"
    b = "[" + ", ".join(str(v) for v in MINHASH_B[:num_hashes]) + "]"
    return f"""list_transform(range(0, {num_hashes}), i -> list_min(list_transform(
        list_transform({elements_sql},
            t -> CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT) % {MINHASH_P}),
        x -> (({a})[i + 1] * x + ({b})[i + 1]) % {MINHASH_P})))"""
