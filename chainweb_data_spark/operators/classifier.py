"""Trained quality classifier — the CCNet/fastText recipe re-expressed
for Spark's cost model: FIT on a bounded, deterministically-sampled
subset with proxy labels; SCORE the full corpus as pure column
arithmetic (whole-stage codegen, zero Python, zero shuffle).

The curation literature's standard quality gate is a tiny linear model
over cheap features, trained against a proxy signal (CCNet labels by
LM perplexity; fastText classifiers by reference-corpus membership).
The expensive part at 100 TB is never the fit — a linear model wants a
few thousand examples — it is applying the model to every document.
This module keeps those costs where they belong:

- **Trainer** (`train_quality_lr` / registration twin
  `train_quality_lr_parquet`): the IVF-quantizer trainer pattern
  (operators/similarity.py `ivf_train_kmeans` /
  `train_ivf_centroids_parquet`) applied to logistic regression — the
  SAME md5-mod sample rule (distributed JVM-side filter; only ≈
  ``sample_size`` rows reach the driver), id-ascending sort, then a
  fully deterministic fit: zero-init weights, fixed-iteration full-batch
  gradient descent in float64, no RNG anywhere — so the trained weights
  are bit-reproducible and can live inside an exact SQL oracle as
  literals.  Proxy labels are computed ON THE SAMPLE: add-one-smoothed
  unigram NLL against the sample's own vocabulary, label 1 (keep) for
  docs at or below the median NLL — the CCNet move with the LM shrunk to
  what a driver can hold.
- **Scorer** (`score_quality_lr`): logit = b + Σ wᵢ·(fᵢ−μᵢ)/σᵢ over five
  engine-portable features (token count, mean token length, space
  ratio, stopword ratio, distinct-token ratio — all rational arithmetic
  of integers, no transcendentals, so DuckDB and Spark agree
  bit-for-bit; the sigmoid is monotone, so thresholding the LOGIT at 0
  is thresholding the probability at 0.5 without ever evaluating
  ``exp`` cross-engine).  Emitted as one projection; ``keep`` is the
  rounded logit compared to 0.

Reference parity: none — the reference (haskell-src, Postgres SQL) has
no ML surface; this extends the beyond-reference curation suite's
quality family (heuristics → Gopher rules → LM perplexity → trained
linear gate).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import LANG_STOPWORDS, occurrences, token_count, word_stopword_hits

FEATURE_NAMES = [
    "n_tokens",
    "mean_token_len",
    "space_ratio",
    "stopword_ratio",
    "distinct_ratio",
]
LR_SAMPLE = 2048
LR_ITERS = 300
LR_RATE = 0.5


def _py_features(text: str) -> list[float]:
    """Driver-side feature twin of :func:`feature_columns` — used only to
    FIT (weights need no bit-parity with the scoring expressions; the
    gate checks scoring, where both engines evaluate the same SQL-exact
    formulas)."""
    nc = len(text)
    nsp = text.count(" ")
    nt = 0 if nc == 0 else nsp + 1
    toks = text.split(" ") if nc else []
    stop = sum(1 for t in toks if t in _EN_STOP)
    return [
        float(nt),
        (nc - nsp) / max(nt, 1),
        nsp / max(nc, 1),
        stop / max(nt, 1),
        len(set(toks)) / max(nt, 1),
    ]


_EN_STOP = set(LANG_STOPWORDS["en"])


def proxy_labels(texts: list[str]) -> np.ndarray:
    """CCNet-style proxy labels for (cleaned) sample texts: add-one-
    smoothed unigram NLL against the sample's own vocabulary, label 1
    (keep) at or below the median NLL.  Deterministic."""
    counts: dict[str, int] = {}
    total = 0
    for t in texts:
        if t:
            for tok in t.split(" "):
                counts[tok] = counts.get(tok, 0) + 1
                total += 1
    vocab = len(counts)
    nlls = []
    for t in texts:
        toks = t.split(" ") if t else []
        if not toks:
            nlls.append(math.inf)
            continue
        s = 0.0
        for tok in toks:
            s -= math.log((counts.get(tok, 0) + 1) / (total + vocab))
        nlls.append(s / len(toks))
    finite = sorted(v for v in nlls if v != math.inf)
    if not finite:
        raise ValueError("proxy_labels: sample has no non-empty docs")
    med = finite[(len(finite) - 1) // 2]
    return np.array([1.0 if v <= med else 0.0 for v in nlls])


def _fit_lr(
    X: np.ndarray, y: np.ndarray, iters: int, rate: float
) -> dict:
    """Standardize + fixed-iteration full-batch gradient descent —
    zero-init, float64, no RNG: same (X, y) ⇒ bit-identical weights."""
    mu = X.mean(axis=0)
    sd = np.maximum(X.std(axis=0), 1e-9)
    Xs = (X - mu) / sd
    w = np.zeros(X.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        err = p - y
        w -= rate * (Xs.T @ err) / n
        b -= rate * float(err.mean())
    return {
        "features": list(FEATURE_NAMES),
        "w": [float(v) for v in w],
        "b": float(b),
        "mu": [float(v) for v in mu],
        "sd": [float(v) for v in sd],
    }


def fit_quality_lr_rows(
    ids: np.ndarray,
    texts: list[str],
    iters: int = LR_ITERS,
    rate: float = LR_RATE,
) -> dict:
    """Deterministic core shared by both trainers: proxy-label the
    (already sampled, id-sorted) rows by sample-vocabulary unigram NLL,
    standardize, and fit logistic regression by fixed-iteration
    full-batch gradient descent.  Same rows ⇒ bit-identical model."""
    # NULL text behaves like empty text (the scorer's features are all
    # NULL-propagating, but a crashed TRAINER on one bad row would be
    # worse than a neutral example)
    texts = ["" if t is None else t for t in texts]
    X = np.asarray([_py_features(t) for t in texts], dtype=np.float64)
    y = proxy_labels(texts)
    return _fit_lr(X, y, iters, rate)


def holdout_eval_lr(
    ids: np.ndarray,
    texts: list[str],
    iters: int = LR_ITERS,
    rate: float = LR_RATE,
) -> dict:
    """Held-out quality measurement for the trained gate (round-6 verdict
    #8): the gated oracle proves the SCORING arithmetic; this measures
    whether the gate is any GOOD.  Deterministic even/odd positional
    split of the id-sorted sample (no RNG), proxy labels computed ONCE on
    the full sample (the ground truth both halves share), fit on the even
    half, score the odd half with the trained weights, report rank AUC
    (Mann-Whitney with tie-average ranks) and precision of the production
    threshold (logit > 0).  Returns ``{"auc", "precision_at_0",
    "n_train", "n_holdout", "base_rate"}``; ``auc`` is None when the
    holdout is single-class (undefined, not zero)."""
    texts = ["" if t is None else t for t in texts]
    X = np.asarray([_py_features(t) for t in texts], dtype=np.float64)
    y = proxy_labels(texts)
    tr, ho = slice(0, None, 2), slice(1, None, 2)
    if len(y[ho]) == 0:
        raise ValueError("holdout_eval_lr: sample too small to split")
    m = _fit_lr(X[tr], y[tr], iters, rate)
    w = np.asarray(m["w"])
    z = m["b"] + ((X[ho] - np.asarray(m["mu"])) / np.asarray(m["sd"])) @ w
    yh = y[ho]
    n_pos, n_neg = int(yh.sum()), int((1 - yh).sum())
    auc = None
    if n_pos and n_neg:
        order = np.argsort(z, kind="stable")
        ranks = np.empty(len(z), dtype=np.float64)
        sz = z[order]
        i = 0
        while i < len(sz):  # tie-average ranks
            j = i
            while j + 1 < len(sz) and sz[j + 1] == sz[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
            i = j + 1
        auc = float(
            (ranks[yh == 1.0].sum() - n_pos * (n_pos + 1) / 2.0)
            / (n_pos * n_neg)
        )
    kept = z > 0.0
    precision = (
        float(yh[kept].mean()) if kept.any() else None
    )
    return {
        "auc": auc,
        "precision_at_0": precision,
        "n_train": int(len(y) - len(yh)),
        "n_holdout": int(len(yh)),
        "base_rate": float(yh.mean()),
    }


def _md5_keep_mask(ids: np.ndarray, sample_size: int) -> np.ndarray:
    m = max(1, len(ids) // max(1, sample_size))
    if m <= 1:
        return np.ones(len(ids), dtype=bool)
    return np.array(
        [
            int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16) % m == 0
            for i in ids
        ]
    )


def collect_lr_sample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sample_size: int = LR_SAMPLE,
) -> tuple[np.ndarray, list[str]]:
    """The distributed sample rule, shared by training and held-out
    evaluation: md5-mod filter JVM-side (no sort, no full collect — the
    ``_collect_train_sample`` rule), ≈ ``sample_size`` (id, text) rows
    reach the driver, returned id-sorted.  O(sample) driver memory at
    any corpus size."""
    n = df.count()
    m = max(1, n // max(1, sample_size))
    samp = df.select(id_col, text_col)
    if m > 1:
        digest = F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long")
        samp = samp.filter(F.pmod(digest, F.lit(m)) == 0)
    rows = samp.collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    order = np.argsort(ids)
    texts = [rows[i][1] for i in order]
    return ids[order], texts


def train_quality_lr(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sample_size: int = LR_SAMPLE,
    iters: int = LR_ITERS,
    rate: float = LR_RATE,
) -> dict:
    """Distributed-sample trainer: :func:`collect_lr_sample` + the
    deterministic shared fit core."""
    ids, texts = collect_lr_sample(df, id_col, text_col, sample_size)
    return fit_quality_lr_rows(ids, texts, iters, rate)


def train_quality_lr_parquet(
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_size: int = LR_SAMPLE,
    iters: int = LR_ITERS,
    rate: float = LR_RATE,
) -> dict:
    """Registration-time twin of :func:`train_quality_lr`: same sample
    rule and fit over a pyarrow read — no SparkSession — so oracle SQL
    can embed the trained model as literals and the runtime Spark path
    provably reproduces it."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=[id_col, text_col])
    ids = np.asarray(t.column(id_col).to_pylist(), dtype=np.int64)
    texts = t.column(text_col).to_pylist()
    keep = _md5_keep_mask(ids, sample_size)
    ids = ids[keep]
    texts = [texts[i] for i in np.nonzero(keep)[0]]
    order = np.argsort(ids)
    return fit_quality_lr_rows(
        ids[order], [texts[i] for i in order], iters, rate
    )


def feature_columns(text_col: str) -> list[Column]:
    """The five scoring features as Spark columns — integer-exact
    rational arithmetic only (the ``text_quality`` gate proves the first
    four cross-engine; the distinct ratio follows the same shape)."""
    c = F.col(text_col)
    nc = F.length(c)
    nsp = occurrences(c, " ")
    nt = token_count(c)
    return [
        nt.cast("double"),
        (nc - nsp) / F.greatest(nt, F.lit(1)),
        nsp / F.greatest(nc, F.lit(1)),
        word_stopword_hits(c, LANG_STOPWORDS["en"]) / F.greatest(nt, F.lit(1)),
        F.size(F.array_distinct(F.split(c, " "))).cast("long")
        / F.greatest(nt, F.lit(1)),
    ]


def lr_logit_column(text_col: str, model: dict) -> Column:
    """The trained model's logit as a single row-local Column (6-dp
    rounded) — embeddable in any predicate or projection (the curation
    sink's quality stage uses it directly, no join, no collect)."""
    z: Column = F.lit(float(model["b"]))
    for w, mu, sd, f in zip(
        model["w"], model["mu"], model["sd"], feature_columns(text_col)
    ):
        z = z + F.lit(float(w)) * ((f - F.lit(float(mu))) / F.lit(float(sd)))
    return F.round(z, 6)


def score_quality_lr(
    df: DataFrame, id_col: str, text_col: str, model: dict
) -> DataFrame:
    """Apply a trained model: (id, logit-6dp, keep) in ONE codegen
    projection — the 100 TB-side of the operator.  ``keep`` thresholds
    the rounded logit at 0 (= probability 0.5 through the monotone
    sigmoid, which is never evaluated — cross-engine ``exp`` parity is
    not a thing to gamble an exact oracle on)."""
    logit = lr_logit_column(text_col, model)
    return df.select(
        F.col(id_col),
        logit.alias("logit"),
        (logit > F.lit(0.0)).alias("keep"),
    )
