"""Pins for queries/phonetics.py: the SQL soundex chain against an
independent python implementation of the same (documented) simplified
algorithm, plus blocking soundness."""

import itertools
import re

import duckdb

_MAP = dict(zip("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202"))


def _soundex_py(w: str) -> str:
    # translate() semantics: unmapped chars (digits, underscore in
    # nation names) pass through unchanged
    digits = "".join(_MAP.get(c, c) for c in w.upper())
    collapsed = re.sub(r"(.)\1+", r"\1", digits)  # python HAS backrefs
    tail = collapsed[1:].replace("0", "")
    return (w[0].upper() + (tail + "000")[:3])[:4]


def test_soundex_matches_python_reference(spark, sf_dir):
    from etl_mp_transactions_spark.queries.phonetics import (
        phonetic_match_pairs,
    )

    rows = phonetic_match_pairs(spark, sf_dir).collect()
    con = duckdb.connect()
    words = sorted(
        w[0]
        for w in con.execute(
            f"""SELECT DISTINCT unnest(string_split(p_name, ' '))
                FROM '{sf_dir}/part.parquet'
                UNION
                SELECT DISTINCT p_type FROM '{sf_dir}/part.parquet'
                UNION
                SELECT DISTINCT n_name FROM '{sf_dir}/nation.parquet'"""
        ).fetchall()
    )
    con.close()
    keys = {w: _soundex_py(w) for w in words}
    expected = set()
    for w1, w2 in itertools.combinations(words, 2):
        if keys[w1] == keys[w2]:
            a, b = sorted((w1, w2))
            expected.add((keys[a], a, b))
    got = {(r.sdx, r.w1, r.w2) for r in rows}
    assert got == expected
    for r in rows:
        assert r.sdx == _soundex_py(r.w1) == _soundex_py(r.w2)
        assert (r.verified == 1) == (r.lev <= 2)


def test_soundex_classic_examples(spark):
    # classic pairs that must collide under the simplified algorithm
    for a, b in [("Robert", "Rupert"), ("Smith", "Smyth")]:
        assert _soundex_py(a) == _soundex_py(b)
    assert _soundex_py("Robert") == "R163"
    assert _soundex_py("Tymczak")[:1] == "T"
