"""Maximal-span exact substring dedup (queries/textspans.py
duplicate_maximal_spans): a brute-force python maximal-common-
substring scan over document pairs must reproduce Spark's span list
exactly — maximality, gap-freeness, and offsets. The pair semantics
are pair-LOCAL (a span between docs a and b depends on no other doc),
so the replay runs on a doc_id sample and compares the matching
result slice."""

from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.textspans import NGRAM
from etl_mp_transactions_spark.registry import queries
from etl_mp_transactions_spark.sources.tables import load_table

SAMPLE = 25


def _sample_docs(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(SAMPLE)
        .select("doc_id", "text")
        .collect()
    )
    return {r["doc_id"]: r["text"].split(" ") for r in rows}


def _brute_maximal_spans(docs):
    """All maximal equal-token runs of length >= NGRAM between every
    doc pair, by walking every alignment diagonal."""
    out = set()
    ids = sorted(docs)
    for i, da in enumerate(ids):
        for db in ids[i + 1:]:
            A, B = docs[da], docs[db]
            for diag in range(-(len(B) - 1), len(A)):
                pa = max(0, diag)
                pb = pa - diag
                run = 0
                while pa <= len(A) and pb <= len(B):
                    hit = (
                        pa < len(A)
                        and pb < len(B)
                        and A[pa] == B[pb]
                    )
                    if hit:
                        run += 1
                    else:
                        if run >= NGRAM:
                            out.add(
                                (
                                    da,
                                    db,
                                    pa - run,
                                    pa - 1,
                                    pb - run,
                                    pb - 1,
                                    run,
                                )
                            )
                        run = 0
                    pa += 1
                    pb += 1
    return out


def test_maximal_spans_match_bruteforce(spark, sf_dir):
    docs = _sample_docs(spark, sf_dir)
    want = _brute_maximal_spans(docs)
    rows = queries()["duplicate_maximal_spans"](spark, sf_dir).collect()
    got = {
        (
            r["doc_a"],
            r["doc_b"],
            r["a_start"],
            r["a_end"],
            r["b_start"],
            r["b_end"],
            r["span_tokens"],
        )
        for r in rows
        if r["doc_a"] in docs and r["doc_b"] in docs
    }
    assert got == want


def test_maximal_spans_wellformed(spark, sf_dir):
    rows = queries()["duplicate_maximal_spans"](spark, sf_dir).collect()
    texts = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    assert rows, "dup-heavy synthetic corpus must contain shared spans"
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["span_tokens"] >= NGRAM
        assert r["a_end"] - r["a_start"] == r["b_end"] - r["b_start"]
        a = texts[r["doc_a"]][r["a_start"]:r["a_end"] + 1]
        b = texts[r["doc_b"]][r["b_start"]:r["b_end"] + 1]
        assert a == b and len(a) == r["span_tokens"]
        # maximality: the span cannot extend one token either way
        ta, tb = texts[r["doc_a"]], texts[r["doc_b"]]
        if r["a_start"] > 0 and r["b_start"] > 0:
            assert ta[r["a_start"] - 1] != tb[r["b_start"] - 1]
        if r["a_end"] + 1 < len(ta) and r["b_end"] + 1 < len(tb):
            assert ta[r["a_end"] + 1] != tb[r["b_end"] + 1]


def test_cut_apply_wellformed(spark, sf_dir):
    """dedup_cut_spans_apply: kept text reconstructs from the kept
    token count, cuts only ever REMOVE tokens, earliest-occurrence
    docs are never cut, and the corpus-wide duplicated mass shrinks."""
    rows = queries()["dedup_cut_spans_apply"](spark, sf_dir).collect()
    spans = queries()["duplicate_maximal_spans"](spark, sf_dir).collect()
    # duplicate_maximal_spans orients pairs doc_a < doc_b, so doc_b is
    # the LATER doc — the side the cut falls on
    later_docs = {r["doc_b"] for r in spans}
    earlier_only = {r["doc_a"] for r in spans} - later_docs
    by_id = {r["doc_id"]: r for r in rows}
    assert sum(r["n_tokens"] - r["kept_tokens"] for r in rows) > 0
    for r in rows:
        assert 0 <= r["kept_tokens"] <= r["n_tokens"]
        ntok = len(r["text_dedup"].split(" ")) if r["text_dedup"] else 0
        assert ntok == r["kept_tokens"]
        if r["doc_id"] not in later_docs:
            assert r["kept_tokens"] == r["n_tokens"]
    # docs that only ever appear as the EARLIER side keep everything
    for d in earlier_only:
        assert by_id[d]["kept_tokens"] == by_id[d]["n_tokens"]
