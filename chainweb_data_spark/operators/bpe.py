"""Byte-pair-encoding tokenizer: deterministic training + distributed
encoding — the real subword step behind the `token counting` /
`encode_token_ids` operators (SURVEY's training-data north star).

Shape mirrors the PQ/IVF quantizers (``operators/similarity.py``):

- **Training** runs on a word-frequency TABLE, not the corpus: the
  distributed side computes word counts (one explode + map-combined
  groupBy — vocabulary ≪ corpus), the driver folds the classic Sennrich
  merge loop over that dict.  Cost is O(vocab × merges) regardless of
  corpus size.
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


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) — the distributed half of training; vocabulary-sized."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 64
) -> list[tuple[str, str]]:
    """Train merges from the corpus: word counts distributed, merge loop
    driver-side over the vocabulary-sized dict."""
    counts = {r["word"]: r["n"] for r in word_counts(df, text_col).collect()}
    return train_merges_from_counts(counts, n_merges)


def bpe_train_parquet(
    path: str, text_col: str = "text", n_merges: int = 64
) -> list[tuple[str, str]]:
    """Registration-time twin over a pyarrow read — no SparkSession; same
    counts, same loop, bit-identical merges."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=[text_col])
    counts: dict[str, int] = {}
    for text in t.column(text_col).to_pylist():
        for w in (text or "").split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    return train_merges_from_counts(counts, n_merges)


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
