"""Broadcast Bloom-filter n-gram decontamination.

The exact decontamination operator (``operators/contamination.py``)
broadcasts the benchmark's distinct n-gram *strings* and joins. That is
the right call when the benchmark set fits a string broadcast; when the
held-out suite grows to hundreds of millions of n-grams (a full eval
stack against a 100 TB corpus), the broadcast side is the bottleneck.
The standard fix is the CCNet/Dolma-style Bloom membership probe: the
benchmark n-grams are folded into an m-bit Bloom filter (k hash
probes per n-gram) and every training document is tested against the
bit array — a *map-only* pass with zero shuffle and zero explode: the
per-document flag count is computed inside the projection itself
(``size(filter(ngrams, g -> bloom_hit(g)))``), so the 100 TB cost is
one corpus scan. False positives exist by construction (that is the
size trade); callers either over-remove (the common policy — removal
is cheap, leakage is not) or confirm flagged docs with the exact join,
which then runs on the tiny flagged subset only.

Determinism: positions come from md5 (both engines compute it
bit-for-bit), so a driver oracle can replay the EXACT bit array —
false positives included — making the whole probabilistic operator
hash-certifiable (same convention as the md5 SimHash gate,
``queries/dedup.py:dedup_simhash_md5_pairs``).

In this sandbox the bit array rides the plan as a packed array<long>
literal (m/64 words — a 65,536-bit filter is 8 KB of plan, constant
per task); on a real cluster the same words travel as a broadcast
variable feeding the same expression. Reference surface: elliot14A/karna README.md:2 (corpus
curation verbs implied by the analytics surface); the algorithmic shape
is the public Bloom-1970 / GPT-3-appendix-C decontamination design.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from karna_spark.operators.text import word_ngrams

# Defaults sized for the fixture corpus: ~1.4k benchmark 4-grams at
# sf0.01 (6% fill — FP ~2e-4) and ~12.5k at sf0.1 (43% fill — FP ~8%,
# deliberately demonstrating the false-positive regime the size trade
# buys). Production sizing is m ≈ -k·n / ln(1 - p^(1/k)).
M_BITS = 65_536
K_HASHES = 3


def _position(value: Column, seed: int, m_bits: int) -> Column:
    """Bloom position ``seed`` of a string value: the first 8 hex
    digits of md5("<seed>:<value>") mod ``m_bits``. Pure JVM
    (md5 + conv), replayed digit-by-digit by the DuckDB oracle.

    One md5 PER PROBE, not one sliced digest per value: the probe
    conjunction short-circuits (interpreted And skips the right side
    on a false left), so against a sparse filter the average gram
    costs ~1 + fill + fill² probes ≈ 1 hash — while the
    share-one-digest form pays a per-gram digest-array
    materialization that measured ~2× slower than the hashes it
    saved."""
    hx = F.md5(F.concat(F.lit(f"{seed}:"), value).cast("binary"))
    return F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % m_bits


def bloom_position_sql(value_expr: str, seed: int, m_bits: int) -> str:
    """The DuckDB spelling of :func:`_position` (no conv() there — the
    8-digit hex prefix is folded positionally)."""
    terms = [
        f"(strpos('0123456789abcdef', substr(md5('{seed}:' || {value_expr}),"
        f" {d}, 1)) - 1) * {16 ** (8 - d)}"
        for d in range(1, 9)
    ]
    return "((" + " + ".join(terms) + f") % {m_bits})"


def bloom_bits(
    df: DataFrame, col: str, m_bits: int = M_BITS, k: int = K_HASHES
) -> list[int]:
    """Build the filter: distinct set bit positions of every value in
    ``df[col]``, packed into ``m_bits/64`` signed 64-bit words. The
    collect is bounded by ``min(k·|values|, m_bits)`` ints — filter
    metadata, never data-scale (the benchmark side of decontamination
    is small by definition; the corpus side never enters this job).

    Packed words, not one boolean/char per bit: the probe runs inside
    a higher-order-function lambda (interpreted, not codegen), where
    both a per-bit array literal (m-child CreateArray re-evaluated per
    row past foldability limits) and a '0'/'1' string literal
    (UTF8String.substring walks bytes → O(position) per probe) were
    measured at 20-90× the scan cost. element_at + getbit on the
    64×-smaller word array is O(1) and keeps a 65,536-bit filter an
    8 KB plan constant."""
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    pos = (
        df.select(
            F.explode(
                F.array(*[_position(F.col(col), i, m_bits) for i in range(k)])
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for row in pos:
        p = row["p"]
        words[p // 64] |= 1 << (p % 64)
    # two's-complement: bit 63 set → negative Java long
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_hit(value: Column, words: Column, m_bits: int, k: int) -> Column:
    """Membership probe: all ``k`` positions set in ``words`` (the
    packed array<long> column/literal). element_at is 1-based; getbit
    indexes the two's-complement word from bit 0. The conjunction is
    ordered so it short-circuits on the first unset bit."""
    probes = []
    for i in range(k):
        p = _position(value, i, m_bits)
        word = F.element_at(words, (p / 64).cast("int") + 1).cast("long")
        probes.append(F.getbit(word, p % 64) == 1)
    return reduce(Column.__and__, probes)


def bloom_flag_ngrams(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
) -> DataFrame:
    """Per-doc count of distinct word ``n``-grams whose Bloom probe
    hits — EVERY train doc, zero included: ``(id_col, n_flagged)``.

    Two jobs: a benchmark-scale build (bounded collect), then the
    map-only corpus probe — no join, no explode, and deliberately no
    ``n_flagged >= 1`` filter here: Catalyst substitutes a predicate
    on a projected alias into the Filter node, so thresholding in the
    same plan evaluates the whole probe TWICE per row (measured 2×).
    Callers threshold downstream of whatever boundary follows.
    """
    import numpy as np

    bench_ngrams = bench.select(
        F.explode(word_ngrams(F.col(text_col), n)).alias("g")
    ).distinct()
    # numpy-backed lit → ONE ArrayType Literal (a Java long[]); a
    # plain python list becomes a CreateArray with m/64 child
    # expressions, measured 2× slower per probe in the interpreted
    # HOF path.
    bits = F.lit(np.array(bloom_bits(bench_ngrams, "g", m_bits, k), np.int64))
    grams = F.array_distinct(word_ngrams(F.col(text_col), n))
    n_flagged = F.size(
        F.filter(grams, lambda g: bloom_hit(g, bits, m_bits, k))
    )
    return train.select(
        F.col(id_col), n_flagged.cast("long").alias("n_flagged")
    )
