"""Text-analysis operators for training-data pipelines (SURVEY.md §2.9):
language ID, quality scoring, token counting, document fingerprinting.

All pure expressions (split/regexp/aggregate) — language ID over 100 TB
is a map-only scan; none of these shuffle. Ratios are int/int divisions
(exact, engine-portable doubles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker stopwords per language — tiny fixed lists keep the heuristic
# deterministic and SQL-expressible; order breaks score ties (first wins)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "les", "et", "des", "une"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def _tokens(text_col) -> Column:
    return F.split(text_col, r"\s+")


def _marker_count(tokens: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t))).cast("long")


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram-heuristic language ID: argmax of marker-token counts,
    deterministic tie-break by language order, 'und' when no marker
    hits. Adds predicted_lang + per-language scores."""
    toks = _tokens(F.col(text_col))
    df = docs.withColumn("_toks", toks)
    for lang, markers in LANG_MARKERS.items():
        df = df.withColumn(f"score_{lang}", _marker_count(F.col("_toks"), markers))
    best = F.greatest(*[F.col(f"score_{m}") for m in LANG_MARKERS])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # first language reaching the max wins
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return df.withColumn("predicted_lang", pred).drop("_toks")


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + blended score:
    n_tokens, mean token length, stopword ratio, punctuation ratio.
    Score = 0.4·stopword_ratio + 0.3·min(n_tokens/100, 1)
          + 0.3·(1 - punct_ratio), same expression in the oracle."""
    toks = _tokens(F.col(text_col))
    n_tokens = F.size(toks)
    text_len = F.length(text_col)
    punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^\w\s]"), 0))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    stop_n = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    df = (
        docs.withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn(
            "mean_token_len",
            # try_divide: split('') yields [''] so n_tokens ≥ 1, but a
            # null-text row gives null; empty text gives text_len=0 and
            # under ANSI a plain division would abort the whole job
            F.try_divide(text_len - (n_tokens - 1), n_tokens),
        )
        .withColumn("stopword_ratio", F.try_divide(stop_n, n_tokens))
        .withColumn("punct_ratio", F.try_divide(punct, text_len))
    )
    score = (
        F.lit(0.4) * F.col("stopword_ratio")
        + F.lit(0.3) * F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.col("punct_ratio"))
    )
    return df.withColumn("quality", score)


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword count (letter runs, digit
    runs, and single punctuation as separate tokens — the regex proxy
    for a real tokenizer's pre-tokenization)."""
    ws = F.size(_tokens(F.col(text_col)))
    bpe = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    )
    return docs.withColumn("ws_tokens", ws.cast("long")).withColumn("bpe_tokens", bpe.cast("long"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the normalized text (lowercase,
    non-alnum collapsed to single spaces, trimmed) — the cheap
    canonical-form dedup key."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " ")
    )
    return docs.withColumn("fingerprint", F.md5(norm))


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 16,
    stride: int = 8,
) -> DataFrame:
    """Split each document into overlapping token windows — the LLM
    pretraining chunking step. One row per (doc, chunk): chunk_idx
    (0-based), chunk_text, n_chunk_tokens.

    Pure expressions: sequence() generates the window starts, slice()
    cuts each window — explode is the only row-amplifying op and the
    whole thing stays in one codegen span; at 100 TB this is a map-only
    scan with ~n_tokens/stride output amplification and zero shuffle.
    """
    toks = _tokens(F.col(text_col))
    df = docs.withColumn("_toks", toks)
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("_toks"), F.lit(1)), F.lit(stride)
    )
    df = df.withColumn("_start", F.explode(starts))
    chunk = F.slice(F.col("_toks"), F.col("_start"), chunk_tokens)
    return (
        df.withColumn("chunk_idx", ((F.col("_start") - 1) / stride).cast("long"))
        .withColumn("chunk_text", F.array_join(chunk, " "))
        .withColumn("n_chunk_tokens", F.size(chunk).cast("long"))
        .drop("_toks", "_start")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    by: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Greedy contiguous sequence packing: within each ``by`` group,
    docs ordered by doc_id are packed into bins of ~``budget`` tokens —
    bin_id = (tokens accumulated BEFORE this doc) div budget, the
    deterministic streaming-packing rule (a doc that straddles a budget
    edge goes to the bin its first token falls in).

    One window sum per group — a single shuffle on the group key; no
    driver-side loop, no global sort. The 100 TB shape for building
    fixed-context training batches.
    """
    from pyspark.sql.window import Window

    n = F.size(_tokens(F.col(text_col))).cast("long")
    w = (
        Window.partitionBy(by)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = docs.withColumn("n_tokens", n).withColumn(
        "_cum_incl", F.sum("n_tokens").over(w)
    )
    return (
        df.withColumn(
            "bin_id", F.expr(f"(_cum_incl - n_tokens) div {budget}")
        )
        .drop("_cum_incl")
    )


def repetition_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, public):
    fraction of tokens taken by the most frequent word, and duplicate
    2-gram / 3-gram fractions. Repetitious documents are the classic
    low-quality-generation signature a pretraining filter removes.

    All expression-level (array slices + zip_with — no explode, no
    shuffle): a map-only scan at any corpus size. Per-doc cost is one
    O(n log n) sort pass (top word via run-length) plus O(n) n-gram
    builds — bounded by document length, not corpus size.

    Physical care: tokens/2-grams/3-grams are let-bound (`let1`) and
    the four metrics come out of ONE struct expanded through
    `F.inline` — higher-order functions don't get common-subexpression
    elimination, and a plain withColumn chain re-inlines the n-gram
    arrays into every reference (g2 evaluated 5×: measured 3× slower
    end-to-end at sf0.1).
    """
    from etl_mp_transactions_spark.operators.textdedup import let1

    def body(words):
        total = F.size(words)
        # top-word count as a run-length fold over the sorted array;
        # the transform(distinct, size(filter)) form is O(distinct·n)
        top_count = F.aggregate(
            F.array_sort(words),
            F.struct(
                F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
            ),
            lambda acc, w: F.struct(
                w.alias("prev"),
                F.when(w == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1))
                .alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
                ).alias("best"),
            ),
            lambda acc: acc["best"],
        )
        # slice lengths clamp to empty on short docs (no
        # sequence(1,0) descending trap)
        len2 = F.greatest(total - 1, F.lit(0))
        len3 = F.greatest(total - 2, F.lit(0))

        def dup_frac(grams):
            n = F.size(grams)
            nd = F.size(F.array_distinct(grams))
            return F.when(n > 0, (n - nd).cast("double") / n).otherwise(F.lit(0.0))

        def with_g2(g2):
            def with_g3(g3):
                return F.struct(
                    total.cast("long").alias("n_words"),
                    F.when(total > 0, top_count.cast("double") / total)
                    .otherwise(F.lit(0.0))
                    .alias("top_word_frac"),
                    dup_frac(g2).alias("dup_2gram_frac"),
                    dup_frac(g3).alias("dup_3gram_frac"),
                )

            g3 = F.zip_with(
                F.slice(g2, 1, len3),
                F.slice(words, 3, len3),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
            return let1(g3, with_g3)

        g2 = F.zip_with(
            F.slice(words, 1, len2),
            F.slice(words, 2, len2),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        return let1(g2, with_g2)

    metrics = let1(_tokens(F.col(text_col)), body)
    # inline (a Generate node) expands the struct once per row;
    # select("m.*") would be collapsed back into four copies
    return docs.select("*", F.inline(F.array(metrics)))


def word_ngrams(docs: DataFrame, n: int, text_col: str = "text") -> Column:
    """Distinct word n-grams as an array column (space-joined), built
    from slice+zip_with chains — expression-level, explode-free."""
    words = _tokens(F.col(text_col))
    total = F.size(words)
    glen = F.greatest(total - (n - 1), F.lit(0))
    acc = F.slice(words, 1, glen)
    for i in range(2, n + 1):
        acc = F.zip_with(
            acc,
            F.slice(words, i, glen),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.array_distinct(acc)


def winnow_fingerprint(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    keep_selected: bool = False,
) -> DataFrame:
    """Winnowing fingerprint (the MOSS rolling-hash scheme) over WORD
    k-shingles: hash every k-word shingle of the normalized text, keep
    the minimum hash of each sliding window of `window` shingles — the
    selected set provably shares members for any sufficiently long
    common word run between documents, which whole-doc hashing cannot
    do. Word shingles (not char grams) keep the hash count ~10x lower
    at identical guarantee granularity — the at-scale choice.

    Pure expressions, map-only, no shuffle, no Python. Emits per doc:
    `n_selected` (distinct winnowed hashes) and `fp_digest` (md5 of
    the sorted selected set) — join-friendly and oracle-exact. Docs
    shorter than k words select nothing (digest of '').
    """
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " ")
    )
    words = F.split(norm, " ")

    def _seq_1_to(n):
        # sequence(1, 0) DESCENDS in Spark (step defaults to -1 when
        # stop < start) while DuckDB's generate_series returns empty —
        # guard short docs explicitly so both engines agree
        return F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<int>")
        )

    shingles = F.zip_with(
        F.zip_with(
            F.slice(words, 1, F.greatest(F.size(words) - (k - 1), F.lit(0))),
            F.slice(words, 2, F.greatest(F.size(words) - (k - 1), F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        F.slice(words, 3, F.greatest(F.size(words) - (k - 1), F.lit(0))),
        lambda ab, c: F.concat(ab, F.lit(" "), c),
    )
    # each step lands in a REAL column before the next lambda uses it:
    # nested higher-order functions get no common-subexpression
    # elimination, so inlining `hashes` into the window lambda would
    # recompute every shingle hash per window — O(n^2) md5 per row
    hashed = docs.withColumn(
        "_wf_hashes",
        F.transform(
            shingles,
            lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint"),
        ),
    )
    h = F.col("_wf_hashes")
    minima = F.transform(
        _seq_1_to(F.size(h) - (window - 1)),
        lambda j: F.array_min(F.slice(h, j, window)),
    )
    winnowed = hashed.withColumn(
        "_wf_sel", F.array_sort(F.array_distinct(minima))
    )
    sel = F.col("_wf_sel")
    out = (
        winnowed.withColumn("n_selected", F.size(sel).cast("bigint"))
        .withColumn(
            "fp_digest",
            F.md5(F.array_join(F.transform(sel, lambda x: x.cast("string")), ",")),
        )
        .drop("_wf_hashes")
    )
    if keep_selected:
        return out.withColumnRenamed("_wf_sel", "selected")
    return out.drop("_wf_sel")
