"""Unigram-Viterbi segmentation (queries/wordpiece.py): a pure-Python
replay of the exact DP (min total bit-length cost, lexicographically
smallest path tiebreak) must reproduce Spark's per-word output — a
third engine beyond the DuckDB oracle — plus reconstruction and
vocabulary invariants, the declared MAX_WORD_LEN corpus bound, and
partition-count invariance."""

from collections import Counter

from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.wordpiece import (
    MAX_PIECE_LEN,
    MAX_WORD_LEN,
    MIN_PIECE_COUNT,
)
from etl_mp_transactions_spark.registry import queries
from etl_mp_transactions_spark.sources.tables import load_table


def _word_counts(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
        .collect()
    )
    return {r["word"]: r["count"] for r in rows}


def _python_viterbi(wcnt):
    pieces = Counter()
    for w, c in wcnt.items():
        for st in range(len(w)):
            for ln in range(1, MAX_PIECE_LEN + 1):
                if st + ln <= len(w):
                    pieces[w[st:st + ln]] += c
    vocab = {
        p: c
        for p, c in pieces.items()
        if c >= MIN_PIECE_COUNT or len(p) == 1
    }
    n = sum(vocab.values())
    cost = {p: len(bin(n // c)) - 2 for p, c in vocab.items()}
    out = {}
    for w in wcnt:
        # dp[i] = (cost, path) for w[:i], compared lexicographically
        dp = [None] * (len(w) + 1)
        dp[0] = (0, "")
        for i in range(1, len(w) + 1):
            best = None
            for ln in range(1, min(MAX_PIECE_LEN, i) + 1):
                p = w[i - ln:i]
                if p not in vocab or dp[i - ln] is None:
                    continue
                pc, pp = dp[i - ln]
                cand = (pc + cost[p], pp + "|" + p if pp else p)
                if best is None or cand < best:
                    best = cand
            dp[i] = best
        out[w] = dp[len(w)]
    return out


def test_matches_pure_python_replay(spark, sf_dir):
    wcnt = _word_counts(spark, sf_dir)
    want = _python_viterbi(wcnt)
    got = {
        r["word"]: (r["total_cost"], r["segmentation"])
        for r in queries()["viterbi_segment_vocab"](spark, sf_dir).collect()
    }
    assert got == want


def test_reconstruction_and_bounds(spark, sf_dir):
    rows = queries()["viterbi_segment_vocab"](spark, sf_dir).collect()
    wcnt = _word_counts(spark, sf_dir)
    assert len(rows) == len(wcnt)
    # the unroll bound is a declared corpus invariant — loud check
    assert max(map(len, wcnt)) <= MAX_WORD_LEN
    for r in rows:
        parts = r["segmentation"].split("|")
        assert "".join(parts) == r["word"]
        assert all(1 <= len(p) <= MAX_PIECE_LEN for p in parts)
        assert r["n_pieces"] == len(parts)


def test_doc_totals_consistent_with_vocab(spark, sf_dir):
    seg = {
        r["word"]: (r["n_pieces"], r["total_cost"])
        for r in queries()["viterbi_segment_vocab"](spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: r
        for r in queries()["viterbi_tokenize_docs"](spark, sf_dir).collect()
    }
    raw = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .collect()
    )
    want_np = Counter()
    want_cost = Counter()
    want_words = Counter()
    for r in raw:
        np_, c = seg[r["word"]]
        want_np[r["doc_id"]] += np_
        want_cost[r["doc_id"]] += c
        want_words[r["doc_id"]] += 1
    for d, row in docs.items():
        assert row["n_words"] == want_words[d]
        assert row["n_pieces"] == want_np[d]
        assert row["cost_sum"] == want_cost[d]


def test_partition_invariance(spark, sf_dir):
    fn = queries()["viterbi_segment_vocab"]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, fn(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_dp_matches_brute_force_enumeration(spark, sf_dir):
    # stronger than the replay (which shares the DP recurrence):
    # enumerate ALL 2^(L-1) segmentations of each word and take the
    # declared (cost asc, path asc) optimum directly
    from itertools import combinations

    from etl_mp_transactions_spark.queries.wordpiece import (
        MAX_PIECE_LEN as MP,
        MIN_PIECE_COUNT as MC,
    )

    wcnt = _word_counts(spark, sf_dir)
    pieces = Counter()
    for w, c in wcnt.items():
        for st in range(len(w)):
            for ln in range(1, MP + 1):
                if st + ln <= len(w):
                    pieces[w[st:st + ln]] += c
    vocab = {p: c for p, c in pieces.items() if c >= MC or len(p) == 1}
    n = sum(vocab.values())
    cost = {p: len(bin(n // c)) - 2 for p, c in vocab.items()}

    def brute(w):
        best = None
        L = len(w)
        for k in range(L):  # choose cut positions
            for cuts in combinations(range(1, L), k):
                bounds = [0, *cuts, L]
                parts = [w[a:b] for a, b in zip(bounds, bounds[1:])]
                if any(len(p) > MP or p not in vocab for p in parts):
                    continue
                cand = (sum(cost[p] for p in parts), "|".join(parts))
                if best is None or cand < best:
                    best = cand
        return best

    got = {
        r["word"]: (r["total_cost"], r["segmentation"])
        for r in queries()["viterbi_segment_vocab"](spark, sf_dir).collect()
    }
    for w in wcnt:
        assert got[w] == brute(w), w


def test_em_recount_consistent_with_segmentations(spark, sf_dir):
    # the M-step usage counts must equal a direct recount over the
    # emitted segmentations, weighted by word frequency; survivors
    # are exactly the pieces some segmentation chose
    wcnt = _word_counts(spark, sf_dir)
    segs = {
        r["word"]: r["segmentation"]
        for r in queries()["viterbi_segment_vocab"](spark, sf_dir).collect()
    }
    want = Counter()
    for w, seg in segs.items():
        for p in seg.split("|"):
            want[p] += wcnt[w]
    rows = queries()["viterbi_em_recount"](spark, sf_dir).collect()
    got = {r["piece"]: r["used_count"] for r in rows}
    assert got == dict(want)
    n2 = sum(want.values())
    for r in rows:
        assert r["new_cost"] == len(bin(n2 // r["used_count"])) - 2
