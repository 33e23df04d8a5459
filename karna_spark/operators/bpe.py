"""Distributed BPE merge learning (byte-pair encoding, Sennrich 2016).

The north-star pipeline's token counting used a BPE-ish regex
approximation; this module learns REAL merge rules from the corpus —
the step that turns "token counting" into an actual trainable
tokenizer. Reference capability: declared query surface over tabular
files (reference README.md:2); no reference implementation exists
(karna-core/src/lib.rs:1-14 is the cargo template), so the design is
Spark-shaped end to end:

- Training operates on the WORD-FREQUENCY table, not the corpus: one
  corpus pass aggregates (word, freq); every subsequent iteration
  touches only the |vocab| frame (∼10M rows at web scale — frame-,
  not corpus-scale). This is the classic BPE formulation: pair counts
  are identical because words are i.i.d. contexts for adjacent pairs.
- Each iteration is ONE distributed aggregate (explode adjacent symbol
  pairs weighted by word frequency → sum per pair) plus a 1-row
  ``collect`` of the argmax (driver traffic is one row per merge, like
  connected-components' convergence count). The winning pair is
  deterministic: max count, then lexicographic (left, right).
- The merge itself is a JVM-side left-to-right fold (``F.aggregate``)
  over each word's symbol array — greedy non-overlapping, matching
  the reference algorithm; no Python in the per-word path.
- Lineage is truncated with ``localCheckpoint`` every few merges and
  the symbol frame is re-persisted per round (the CC loop's cache
  discipline, operators/cluster.py).

Certification: ``tests/test_operators.py`` replays the same
word-frequency table through a pure-Python reference implementation
and requires the merge tables to be identical (the union-find-vs-CC
pattern); the registry exposes the merge table as a rows-only driver
query (iterative, not SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

END = "</w>"  # end-of-word marker symbol



def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass → (word, freq). Lower-cased whitespace words —
    the same normalization the text operators use."""
    from karna_spark.operators.text import words

    return (
        docs.select(F.explode(words(F.lower(F.trim(F.col(text_col))))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(wf: DataFrame) -> DataFrame:
    """(w, syms: array<string>, freq) — characters plus end marker."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    return wf.select(
        "w",
        F.concat(chars, F.array(F.lit(END))).alias("syms"),
        F.col("freq").cast("bigint").alias("freq"),
    )


def _merge_expr(a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) into a+b inside a
    symbol array — a single JVM-side fold, overlapping occurrences
    resolved left-first exactly like the reference implementation.

    Measured and rejected (r12 optimization round): guarding the fold
    with a linear ``exists`` over the adjacent pairs so non-matching
    words skip the O(n²)-allocation fold — identical output, but the
    doubled expression tree costs more in per-iteration analysis and
    codegen than the skipped per-row work saves at fixture vocab sizes
    (80-merge ABBA medians: 12.5 s guarded vs 10.9 s plain). Worth
    re-measuring on a vocabulary where per-row work dominates the
    per-iteration fixed cost (≥10M distinct words)."""
    merged = a + b
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe(
    wf: DataFrame,
    num_merges: int = 20,
    min_pair_freq: int = 2,
    checkpoint_every: int = 4,
    return_symbols: bool = False,
):
    """Learn up to ``num_merges`` BPE merges from a (w, freq) table.

    Returns [(merge_idx, left, right, merged, pair_freq), ...] in
    learned order — deterministic at any parallelism (count-desc then
    lexicographic tie-break). Stops early when no adjacent pair
    reaches ``min_pair_freq``. With ``return_symbols=True``, returns
    ``(merges, symbols_df)`` where symbols_df is the final
    (w, syms, freq) tokenization of every vocabulary word — the
    word→tokens lookup a corpus tokenizer joins against (the caller
    owns unpersisting its `_karna_persisted` handle).
    """
    # ONE Spark job per merge: the pair-count argmax is the only
    # action, and it doubles as the materializer of the current
    # iteration's persisted symbol frame. The PREVIOUS frame stays
    # persisted ("pending") until the argmax proves its successor is
    # fully cached — only then is it dropped, so no unpersist can ever
    # force a lineage replay back through earlier merges. (The r7
    # shape paid an extra count() job per iteration to materialize
    # eagerly — at the 200-merge bench depth that doubled wall time.)
    syms = _initial_symbols(wf).persist(StorageLevel.MEMORY_AND_DISK)
    cached = syms    # persisted frame backing `syms`
    pending = None   # predecessor frame awaiting safe release
    merges: list[tuple[int, str, str, str, int]] = []
    # The adjacent-pair expression is loop-INVARIANT (it only names
    # columns); Column objects are immutable, so build it once —
    # rebuilding it per merge paid ~20 py4j round-trips × iterations
    # of pure driver chatter.
    pair_expr = F.explode(
        F.zip_with(
            F.slice(F.col("syms"), 1, F.size("syms") - 1),
            F.slice(F.col("syms"), 2, F.size("syms") - 1),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        )
    ).alias("p")
    try:
        for it in range(num_merges):
            pairs = syms.select("freq", pair_expr)
            best = (
                pairs.groupBy("p.a", "p.b")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.col("cnt").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            # The argmax consumed every partition of `syms` — its
            # persist is materialized; the predecessor can go.
            if pending is not None:
                pending.unpersist()
                pending = None
            if not best or best[0]["cnt"] < min_pair_freq:
                break
            a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
            merges.append((it, a, b, a + b, cnt))
            new_syms = syms.select("w", _merge_expr(a, b).alias("syms"), "freq")
            if it == 0:
                # Size-adaptive parallelism for the remaining merges:
                # the first argmax materialized the cache, so its real
                # in-memory size is known — coalesce (narrow, no
                # shuffle) to size-derived partitions; at fixture
                # scale that is ONE partition, making each later merge
                # a single exchange-free single-task job (a
                # SinglePartition child satisfies the pair-count
                # aggregate's clustering requirement). The count
                # propagates through every later iteration's narrow
                # select. See operators/sizing.py.
                from karna_spark.operators.sizing import coalesce_to_size

                new_syms = coalesce_to_size(new_syms, syms)
            if (it + 1) % checkpoint_every == 0:
                new_syms = new_syms.localCheckpoint(eager=False)
            new_syms = new_syms.persist(StorageLevel.MEMORY_AND_DISK)
            pending = cached
            cached = new_syms
            syms = new_syms
    except BaseException:
        if pending is not None:
            pending.unpersist()
        cached.unpersist()
        raise
    if return_symbols:
        # Materialize the final tokenization before releasing its
        # predecessor, then hand the persisted frame to the caller;
        # the release contract rides on it (operators/dedup.py).
        if pending is not None:
            syms.count()
            pending.unpersist()
        syms._karna_persisted = [cached]  # type: ignore[attr-defined]
        return merges, syms
    if pending is not None:
        pending.unpersist()
    cached.unpersist()
    return merges


def reference_bpe(
    word_freqs: dict[str, int], num_merges: int = 20, min_pair_freq: int = 2
) -> list[tuple[int, str, str, str, int]]:
    """Pure-Python reference (independent of Spark) for the pytest
    differential: same counting (overlapping adjacent pairs), same
    greedy left-to-right merge, same tie-break."""
    vocab = {tuple(list(w) + [END]): f for w, f in word_freqs.items()}
    merges: list[tuple[int, str, str, str, int]] = []
    for it in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_freq:
            break
        merges.append((it, a, b, a + b, cnt))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges
