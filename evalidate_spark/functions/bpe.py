"""Real vocab-merge (BPE) tokenization for token budgeting at corpus scale.

Three stages, mapped onto Spark's execution model:

1. **Count** — word frequencies are a distributed groupBy (map-side
   combined); only the top-N (count desc, word asc — deterministic) ever
   reach the driver, so the collect is bounded regardless of corpus size.
2. **Learn** — classic byte-pair-encoding merge learning runs driver-side
   on that bounded word-count table (pure Python, deterministic: most
   frequent adjacent symbol pair wins, ties break to the lexicographically
   smallest pair).  The output is an ordered merge list plus the piece
   vocabulary (all single characters seen + every merge product).
3. **Apply** — tokenization is an Arrow-batched pandas UDF over the text
   column with the (small) vocabulary captured in the closure — Spark
   ships it with the serialized UDF; per-batch word caching makes the
   common case a dict hit.  Application is greedy longest-match
   (WordPiece-style, the scheme BERT uses with a BPE-learned vocabulary):
   at each position consume the longest vocabulary piece, else one
   character.  Greedy longest-match is order-free, which keeps the count
   replayable in ANSI SQL (a recursive CTE over a literal vocab table) —
   merge-order application would need loop state no SQL engine exposes.

Characters never seen in training count as one piece each (the UDF and the
SQL oracle both fall back to a single-character step).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Iterable, List, Tuple, Union

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens


# ------------------------------------------------------------------ count
def word_counts(df: DataFrame, text_col: str = "text", max_words: int = 50_000):
    """Top-*max_words* corpus word frequencies as a DataFrame ``(w, n)`` —
    orderBy+limit (TakeOrdered, tree-reduced), so the driver-bound result
    is bounded and deterministic (count desc, word asc)."""
    return (
        df.select(F.explode(tokens(F.col("`%s`" % text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(max_words)
    )


# ------------------------------------------------------------------ learn
def _merge_seq(syms: Tuple[str, ...], a: str, b: str) -> Tuple[str, ...]:
    """One merge pass: replace leftmost non-overlapping (a, b) adjacencies."""
    out: List[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_bpe(
    counts: Union[Dict[str, int], Iterable[Tuple[str, int]]],
    num_merges: int = 200,
) -> List[Tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table: start from
    character symbols, repeatedly merge the most frequent adjacent pair
    (count-weighted; ties break to the lexicographically smallest pair —
    fully deterministic).  Returns the ordered merge list."""
    items = counts.items() if isinstance(counts, dict) else counts
    seqs: Dict[Tuple[str, ...], int] = {}
    for w, c in items:
        if w:
            t = tuple(w)
            seqs[t] = seqs.get(t, 0) + int(c)
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged: Dict[Tuple[str, ...], int] = {}
        for syms, c in seqs.items():
            t = _merge_seq(syms, *best)
            merged[t] = merged.get(t, 0) + c
        seqs = merged
    return merges


def vocab_from_merges(
    counts: Union[Dict[str, int], Iterable[Tuple[str, int]]],
    merges: Iterable[Tuple[str, str]],
) -> List[str]:
    """Piece vocabulary = every character seen in training + every merge
    product, sorted (deterministic order for literal SQL embedding)."""
    items = counts.items() if isinstance(counts, dict) else counts
    vocab = set()
    for w, _ in items:
        vocab.update(w)
    vocab.update(a + b for a, b in merges)
    return sorted(vocab)


def learn_bpe_vocab(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = 50_000,
) -> List[str]:
    """End-to-end: distributed word count → bounded driver collect →
    deterministic merge learning → piece vocabulary."""
    wc = [(r["w"], r["n"]) for r in word_counts(df, text_col, max_words).collect()]
    return vocab_from_merges(wc, learn_bpe(wc, num_merges))


# ------------------------------------------------------------------ apply
def encode_greedy(word: str, vocab: frozenset, max_len: int) -> List[str]:
    """Greedy longest-match piece split of one word (pure-Python reference;
    the UDF counts without materialising pieces)."""
    out, pos, n = [], 0, len(word)
    while pos < n:
        step = 1
        for k in range(min(max_len, n - pos), 1, -1):
            if word[pos : pos + k] in vocab:
                step = k
                break
        out.append(word[pos : pos + step])
        pos += step
    return out


def token_count_bpe_vocab(col: Column, vocab: Iterable[str]) -> Column:
    """Tokens per text under greedy longest-match over *vocab*, as an
    Arrow-batched pandas UDF (int; NULL text → NULL).  The vocabulary is a
    frozenset in the closure; words are memoised per batch."""
    from pyspark.sql.functions import pandas_udf

    vset = frozenset(vocab)
    if not vset:
        raise ValueError("empty BPE vocabulary")
    max_len = max(len(p) for p in vset)

    @pandas_udf("int")
    def cnt(texts: pd.Series) -> pd.Series:
        cache: Dict[str, int] = {}

        def word_tokens(w: str) -> int:
            hit = cache.get(w)
            if hit is not None:
                return hit
            n, pos, L = 0, 0, len(w)
            while pos < L:
                step = 1
                for k in range(min(max_len, L - pos), 1, -1):
                    if w[pos : pos + k] in vset:
                        step = k
                        break
                pos += step
                n += 1
            cache[w] = n
            return n

        out = [
            None if t is None else sum(word_tokens(w) for w in t.split())
            for t in texts
        ]
        return pd.Series(out, dtype="Int32")

    return cnt(col)


def token_counts_bpe(
    df: DataFrame,
    vocab: Iterable[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc BPE token counts ``(doc_id, n_tokens_bpe)`` — one map-only
    Arrow stage, composable with the validation pass."""
    return df.select(
        F.col("`%s`" % id_col).alias(id_col),
        token_count_bpe_vocab(F.col("`%s`" % text_col), vocab).alias("n_tokens_bpe"),
    )
