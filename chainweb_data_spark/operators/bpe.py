"""Byte-pair-encoding tokenizer: deterministic training + distributed
encoding — the real subword step behind the `token counting` /
`encode_token_ids` operators (SURVEY's training-data north star).

Shape mirrors the PQ/IVF quantizers (``operators/similarity.py``):

- **Training** runs on a word-frequency TABLE, not the corpus: the
  distributed side computes word counts (one explode + map-combined
  groupBy), the driver folds the classic Sennrich merge loop over that
  dict.  Cost is O(vocab × merges) regardless of corpus size.
- **The driver collect is CAPPED** (round-6 verdict fix): "vocabulary ≪
  corpus" holds for clean prose but not for 100 TB web text, where
  distinct whitespace "words" (URLs, hashes, code identifiers) run to
  billions.  Training therefore collects only the deterministic
  (count desc, word asc) top ``max_vocab`` rows — a distributed
  TakeOrdered, never the full table — after an optional ``min_count``
  floor applied inside the aggregation.  ``max_vocab`` above
  ``BPE_VOCAB_CEILING`` refuses loudly (the ``_check_matmul_envelope``
  pattern); an actually-truncated vocabulary warns loudly.  The cap is
  mirrored bit-exactly in the pyarrow registration twin so the
  ``bpe_merges`` / ``bpe_encode_docs`` literal oracles stay green: the
  tie-break total order (count desc, word asc) is identical because
  Spark's UTF8String byte-wise compare equals Python's code-point
  compare under UTF-8.
- **Determinism contract**: merge choice is (max pair count, then
  lexicographically smallest pair) — no dict-order dependence — so the
  same word counts always yield the same merge list, which lets the
  TRAINED merges sit in oracle SQL as literals (the ann_ivf/pq move), and
  the pyarrow registration twin provably equals the Spark-side trainer.
- **Encoding** is an Arrow-batched kernel with per-batch word
  memoization: each distinct word segments once per batch (corpus text is
  Zipfian — the cache hit rate IS the speedup), merges applied by rank.

Gates: ``bpe_merges`` (runtime-trained merge table vs registration-trained
literals) and ``bpe_encode_docs`` (per-doc piece sequences hashed vs a
literal-VALUES oracle computed by the same pure-Python encoder at
registration — the multimodal-gate pattern).
"""

from __future__ import annotations

import warnings

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: marks end-of-word so merges can't cross word boundaries and a piece
#: ending a word is distinct from the same piece mid-word (Sennrich 2016).
END = "</w>"


# ---------------------------------------------------------------------------
# pure core (shared by the Spark path and the registration-time twin)
# ---------------------------------------------------------------------------


def train_merges_from_counts(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """The Sennrich merge loop over a word-frequency dict.  Each round
    counts adjacent symbol pairs weighted by word frequency and merges the
    (count desc, pair lexicographic asc) winner; stops early when no pair
    occurs twice.  Pure, deterministic, O(vocab × merges)."""
    words: list[tuple[list[str], int]] = [
        (list(w) + [END], c) for w, c in sorted(word_counts.items()) if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _cnt = best
        merges.append((a, b))
        ab = a + b
        for syms, _c in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [ab]
                else:
                    i += 1
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply trained merges to one word by rank (lowest-rank pair first,
    leftmost occurrence on rank ties) — the standard BPE inference rule."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_text(text: str, ranks: dict, cache: dict) -> list[str]:
    pieces: list[str] = []
    for w in text.split(" "):
        if not w:
            continue
        seg = cache.get(w)
        if seg is None:
            seg = segment_word(w, ranks)
            cache[w] = seg
        pieces.extend(seg)
    return pieces


# ---------------------------------------------------------------------------
# Spark path
# ---------------------------------------------------------------------------


#: hard ceiling on the driver-side vocabulary dict.  ~50M (word, count)
#: rows is already multiple GB of Python strings; above it the trainer
#: REFUSES loudly instead of letting a "cap" silently become an unbounded
#: collect again.
BPE_VOCAB_CEILING = 50_000_000

#: default top-N cap — generous for any real tokenizer-training corpus
#: (GPT-2's BPE trained on ~50k merges from far fewer distinct words) yet
#: bounded: the collect is ≤ this many rows no matter the corpus size.
BPE_MAX_VOCAB = 1_000_000


def word_counts(
    df: DataFrame, text_col: str, min_count: int = 1
) -> DataFrame:
    """(word, n) — the distributed half of training.  ``min_count`` prunes
    the hapax tail inside the aggregation (after the map-side combine, so
    the filter costs nothing extra)."""
    wc = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    if min_count > 1:
        wc = wc.filter(F.col("n") >= min_count)
    return wc


def _check_vocab_envelope(max_vocab: int) -> None:
    if max_vocab > BPE_VOCAB_CEILING:
        raise ValueError(
            f"bpe_train max_vocab={max_vocab} exceeds the driver-collect "
            f"ceiling ({BPE_VOCAB_CEILING}): the top-N word-count table is "
            "collect()ed to the driver for the merge loop. Raise min_count "
            "or train on a sampled sub-corpus instead."
        )


def collect_word_counts(
    df: DataFrame,
    text_col: str,
    min_count: int = 1,
    max_vocab: int = BPE_MAX_VOCAB,
) -> dict[str, int]:
    """The bounded driver collect: deterministic (count desc, word asc)
    top-``max_vocab`` via a distributed TakeOrdered — the driver never
    sees more than ``max_vocab + 1`` rows (the +1 detects truncation
    without a second count job).  Total order: ``word`` is unique, so the
    tie-break is exact and the truncation boundary is stable."""
    _check_vocab_envelope(max_vocab)
    rows = (
        word_counts(df, text_col, min_count)
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(max_vocab + 1)
        .collect()
    )
    if len(rows) > max_vocab:
        rows = rows[:max_vocab]
        warnings.warn(
            f"bpe_train: vocabulary truncated to top {max_vocab} words by "
            "(count desc, word asc); merges are computed from the capped "
            "table. Raise min_count to prune the tail distributedly, or "
            "max_vocab (ceiling applies) to widen the table.",
            stacklevel=2,
        )
    return {r["word"]: r["n"] for r in rows}


def _cap_counts(
    counts: dict[str, int], min_count: int, max_vocab: int
) -> dict[str, int]:
    """Pure twin of :func:`collect_word_counts`'s floor + top-N, applied to
    an in-memory dict — same (count desc, word asc) total order, same
    truncation boundary (Python's code-point string compare equals Spark's
    UTF8String byte compare under UTF-8)."""
    _check_vocab_envelope(max_vocab)
    items = [(w, c) for w, c in counts.items() if c >= min_count]
    items.sort(key=lambda kv: (-kv[1], kv[0]))
    return dict(items[:max_vocab])


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 64,
    min_count: int = 1,
    max_vocab: int = BPE_MAX_VOCAB,
) -> list[tuple[str, str]]:
    """Train merges from the corpus: word counts distributed (floor +
    deterministic top-N cap inside the aggregation — the driver collect is
    bounded), merge loop driver-side over the capped dict."""
    counts = collect_word_counts(df, text_col, min_count, max_vocab)
    return train_merges_from_counts(counts, n_merges)


def bpe_train_parquet(
    path: str,
    text_col: str = "text",
    n_merges: int = 64,
    min_count: int = 1,
    max_vocab: int = BPE_MAX_VOCAB,
) -> list[tuple[str, str]]:
    """Registration-time twin over a pyarrow read — no SparkSession; same
    counts, same floor + top-N cap, same loop, bit-identical merges."""
    import pyarrow.parquet as pq

    _check_vocab_envelope(max_vocab)  # refuse before reading anything
    t = pq.read_table(path, columns=[text_col])
    counts: dict[str, int] = {}
    for text in t.column(text_col).to_pylist():
        for w in (text or "").split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    return train_merges_from_counts(
        _cap_counts(counts, min_count, max_vocab), n_merges
    )


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """(id, pieces array<string>, n_pieces) — Arrow-batched, merge ranks
    broadcast in the closure, per-batch word memoization (Zipfian text
    makes the cache the fast path)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("pieces", T.ArrayType(T.StringType())),
            T.StructField("n_pieces", T.IntegerType()),
        ]
    )

    def _encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cache: dict = {}
            out = [encode_text(t or "", ranks, cache) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "pieces": out,
                    "n_pieces": [len(p) for p in out],
                }
            )

    return df.select(id_col, text_col).mapInPandas(_encode, schema)
