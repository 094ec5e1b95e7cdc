"""Text-analysis Column builders (SURVEY.md category I6 + north-star ops):
tokenization, token counting, occurrence counting, language-ID heuristic,
quality scoring, document fingerprinting, 16-dim SimHash.

All pure ``pyspark.sql.functions`` expressions — no UDFs — so they vectorize
in whole-stage codegen and every one has an exact DuckDB SQL twin for the
oracle. Counting uses integer arithmetic throughout: integer aggregation is
order-insensitive, so Spark's nondeterministic partial-agg order can never
change a result.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization (documents.text is space-separated)."""
    return F.split(text, " ")


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def ngram_concat(t: Column, n: int, sep: str = " ") -> Column:
    """Array of space-joined n-gram strings from token array ``t``, built
    by chaining ``zip_with`` over shifted slices.

    This construction exists for a measured plan hazard: the obvious form
    — ``transform(sequence(1, size-n+1), i -> concat(element_at(t, i),
    ...))`` — references ``t`` INSIDE the lambda, and when that array
    feeds ``explode``, Spark's Generate re-evaluates the referenced
    expression per emitted element: O(len²) work per document (the
    q_winnow_overlap post-mortem measured ~350x on its two-level chain;
    the plain bigram form measures 4-5x at 50-token docs and grows
    unbounded with document length — SCALING.md r12 addendum). zip_with
    lambdas read ONLY their own arguments, so the token slices are
    evaluated once regardless of the consumer. Docs with fewer than
    ``n`` tokens yield an empty array, same as the sequence-guard form.
    """
    m = F.greatest(F.size(t) - (n - 1), F.lit(0))
    out = F.slice(t, 1, m)
    for j in range(1, n):
        out = F.zip_with(
            out,
            F.slice(t, 1 + j, m),
            lambda a, b: F.concat(a, F.lit(sep), b),
        )
    return out


def occurrences(text: Column, needle: str) -> Column:
    """Count non-overlapping occurrences of ``needle`` via the replace-length
    trick — portable integer arithmetic (DuckDB twin uses the same formula)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


# language-ID marker words, checked in fixed precedence order (first max wins)
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " das "],
    "es": [" el ", " los ", " una "],
    "fr": [" le ", " et ", " les "],
    "zh": [" de ", " shi ", " bu "],
}


def lang_scores(text: Column) -> dict[str, Column]:
    padded = F.lower(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        score = None
        for m in markers:
            c = occurrences(padded, m)
            score = c if score is None else score + c
        out[lang] = score
    return out


def lang_id(text: Column) -> Column:
    """Argmax of marker scores, fixed precedence en>de>es>fr>zh, 'unknown'
    when no marker hits — a deterministic n-gram-style heuristic."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("unknown"))
    for lang in LANG_MARKERS:  # dict order == precedence
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr


def stopword_ratio(text: Column) -> Column:
    hits = (
        occurrences(F.lower(text), " the ")
        + occurrences(F.lower(text), " a ")
        + occurrences(F.lower(text), " of ")
    )
    return hits.cast("double") / token_count(text).cast("double")


def avg_token_len(text: Column) -> Column:
    no_space = F.length(F.replace(text, F.lit(" "), F.lit("")))
    return no_space.cast("double") / token_count(text).cast("double")


def quality_band(text: Column) -> Column:
    """Banded 0-3 quality score from length / token stats — integer-banded so
    the oracle compare is exact."""
    n_tok = token_count(text)
    atl = avg_token_len(text)
    return (
        F.when((n_tok >= 50) & (atl >= 3.0) & (atl <= 12.0), F.lit(3))
        .when((n_tok >= 20) & (atl >= 2.0), F.lit(2))
        .when(n_tok >= 5, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
    )


def normalize_text(text: Column) -> Column:
    """Lowercase + whitespace-collapse + trim: canonical form for hashing."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized text. Identical in DuckDB
    (md5 over UTF-8 bytes), so exact-dedup keys agree across engines."""
    return F.md5(normalize_text(text))


def simhash(df, id_col: str, text: Column, n_bits: int = 16,
            spread: int | None = None):
    """``n_bits``-dimension SimHash over the distinct-token set.

    Each dimension consumes one hex digit of a per-token md5 chain —
    dimensions 1-32 from ``md5(tok)``, 33-64 from ``md5(tok || '#1')``, and
    so on (md5 yields 32 hex digits, so every 32 dimensions costs one more
    hash). Digit p contributes (2*hexval - 15) ∈ [-15, +15] to dimension p;
    the per-doc sign vector is the fingerprint. Integer sums →
    order-insensitive, exact in both engines. One explode + one grouped
    aggregation (single shuffle) — at scale this is a map-side-combinable
    agg, not a per-doc loop. 16 bits is demo-width; 64 bits is the
    production width for corpus-scale banding (see
    operators/dedup.py::simhash_neardup_pairs).
    """
    if not 1 <= n_bits <= 128:
        raise ValueError(f"n_bits must be in [1, 128], got {n_bits}")
    # ``spread``: optional repartition BEFORE the token fan-out (q_bigrams
    # rationale). Input splits are sized to pre-explode BYTES, but the
    # n_bits-sum partial aggregation is CPU-bound on the ~100x bigger token
    # stream (one md5 + n_bits digit-convs per token) — a caller that
    # knows its input arrives in few splits (single local file, small
    # compacted table) passes its parallelism to spread the compact doc
    # rows first. Opt-in because the extra shuffle is pure waste when the
    # scan is already well-split (the 100 TB case) or the input is tiny
    # (unit tests) — and byte-based auto-sizing cannot see CPU cost.
    if spread:
        df = df.repartition(spread, id_col)
    tok = df.select(F.col(id_col), F.explode(distinct_tokens(text)).alias("tok"))
    n_hashes = -(-n_bits // 32)
    h = tok
    hcols = []
    for i in range(n_hashes):
        expr = (
            F.md5(F.col("tok"))
            if i == 0
            else F.md5(F.concat(F.col("tok"), F.lit(f"#{i}")))
        )
        h = h.withColumn(f"_h{i}", expr)
        hcols.append(f"_h{i}")
    # Hex digits are consumed 8 at a time: one conv() per 8-digit run packs
    # 32 bits into a long, and each dimension's digit is a shift/mask nibble
    # extract — integer ops inside whole-stage codegen, vs a string
    # substring+conv PER DIGIT per token (the r4 shape: 64 convs/token on
    # the production width; measured ~25% of the banded near-dup query).
    # Digit values are identical, so signatures and the DuckDB twins are
    # byte-for-byte unchanged.
    n_chunks = -(-n_bits // 8)
    for c in range(n_chunks):
        hcol = hcols[(c * 8) // 32]
        h = h.withColumn(
            f"_c{c}",
            F.conv(F.substring(F.col(hcol), (c * 8) % 32 + 1, 8), 16, 10).cast(
                "long"
            ),
        )
    sums = [
        F.sum(
            F.shiftright(F.col(f"_c{(p - 1) // 8}"), 4 * (7 - (p - 1) % 8))
            .bitwiseAND(F.lit(15))
            .cast("int")
            * 2
            - 15
        ).alias(f"s{p}")
        for p in range(1, n_bits + 1)
    ]
    agg = h.groupBy(id_col).agg(*sums)
    bits = [
        F.when(F.col(f"s{p}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for p in range(1, n_bits + 1)
    ]
    return agg.select(F.col(id_col), F.concat(*bits).alias("simhash"))


def simhash16(df, id_col: str, text: Column):
    """16-dimension SimHash (see ``simhash``) — kept as the demo-width
    entry point for the 2x8-bit banded near-dup query."""
    return simhash(df, id_col, text, 16)
