"""Property tests (hypothesis) for the BPE core — pure Python, no Spark.

The invariant that makes BPE safe as a tokenizer: segmentation is a
LOSSLESS re-grouping — stripping the word boundary and concatenating the
pieces of every word reproduces the original text's tokens exactly, for
ANY trained merge list and any input (including words never seen in
training).  Plus trainer determinism: same counts, same merges, and every
merge must have been an adjacent pair at its turn.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from chainweb_data_spark.operators.bpe import (
    END,
    encode_text,
    segment_word,
    train_merges_from_counts,
)

_word = st.text(alphabet="abcde", min_size=1, max_size=8)
_corpus = st.dictionaries(_word, st.integers(1, 9), min_size=1, max_size=12)


@settings(max_examples=200, deadline=None)
@given(_corpus, st.integers(0, 24), st.lists(_word, max_size=6))
def test_bpe_roundtrip_lossless(counts, n_merges, extra_words):
    merges = train_merges_from_counts(counts, n_merges)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in list(counts) + extra_words:  # trained AND unseen words
        seg = segment_word(w, ranks)
        joined = "".join(seg)
        assert joined.endswith(END)
        assert joined[: -len(END)] == w, (w, seg)
    text = " ".join(list(counts) + extra_words)
    pieces = encode_text(text, ranks, {})
    rebuilt = "".join(pieces).replace(END, " ").rstrip(" ")
    assert rebuilt == " ".join(w for w in text.split(" ") if w)


@settings(max_examples=100, deadline=None)
@given(_corpus, st.integers(1, 16))
def test_bpe_training_is_deterministic_and_wellformed(counts, n_merges):
    a = train_merges_from_counts(dict(counts), n_merges)
    b = train_merges_from_counts(dict(reversed(list(counts.items()))), n_merges)
    assert a == b, "training must not depend on dict order"
    assert len(a) <= n_merges
    # each merge's output symbol is buildable from prior merges/chars
    known = set("abcde") | {END}
    for left, right in a:
        assert left in known and right in known, (left, right, a)
        known.add(left + right)
