"""Phonetic entity-resolution operator (SURVEY.md §2.9 extensions):
Soundex blocking + edit-distance verify over the part-name
vocabulary — the fuzzy-name leg of the linkage family (PPJoin covers
token-set similarity; this covers sounds-alike single tokens).

The Soundex key is built from the published algorithm with ONE
simplification (h/w are treated like vowels rather than as
transparent separators) and — critically — the identical expression
chain in both engines, so parity is by construction:

1. digit-code every letter via translate() with the standard map
   (vowels/H/W/Y → 0, B F P V → 1, C G J K Q S X Z → 2, D T → 3,
   L → 4, M N → 5, R → 6);
2. collapse adjacent equal digits with SEVEN chained
   regexp_replace('d{2,}' → 'd') calls — RE2 (DuckDB) has no
   backreferences, so the classic '(\\d)\\1+' collapse is exactly the
   kind of regex that silently works in one engine and not the
   other;
3. key = first letter ++ first 3 non-zero digits of the collapsed
   tail, zero-padded.

Blocking emits phonetic buckets holding ≥2 distinct words; the
verify stage scores within-bucket pairs with levenshtein() (same
unit-cost definition in Spark and DuckDB). Scale: the block join is
vocabulary-sized (distinct words, not rows), grouped on the
4-char key — the textbook blocking shape that makes fuzzy matching
linear instead of quadratic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

_SOUNDEX_MAP = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202")
MAX_LEV = 2


def _soundex_sql(col: str) -> str:
    expr = f"translate(upper({col}), '{_SOUNDEX_MAP[0]}', '{_SOUNDEX_MAP[1]}')"
    for d in "0123456":
        expr = f"regexp_replace({expr}, '{d}{{2,}}', '{d}', 'g')"
    return (
        f"upper(substr({col}, 1, 1)) || "
        f"rpad(substr(replace(substr({expr}, 2), '0', ''), 1, 3), 3, '0')"
    )


def _soundex_spark(col):
    expr = F.translate(F.upper(col), _SOUNDEX_MAP[0], _SOUNDEX_MAP[1])
    for d in "0123456":
        expr = F.regexp_replace(expr, f"{d}{{2,}}", d)
    tail = F.substring(expr, 2, 1000)
    digits = F.regexp_replace(tail, "0", "")
    return F.concat(
        F.upper(F.substring(col, 1, 1)),
        F.rpad(F.substring(digits, 1, 3), 3, "0"),
    )


@query(
    "phonetic_match_pairs",
    f"""
    WITH words AS (
      SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w FROM part
      UNION
      SELECT DISTINCT p_type AS w FROM part
      UNION
      SELECT DISTINCT n_name AS w FROM nation
    ),
    keyed AS (
      SELECT w, {_soundex_sql('w')} AS sdx FROM words
    ),
    pairs AS (
      SELECT a.sdx, a.w AS w1, b.w AS w2,
             levenshtein(a.w, b.w) AS lev
      FROM keyed a JOIN keyed b ON a.sdx = b.sdx AND a.w < b.w
    )
    SELECT sdx, w1, w2, lev,
           CASE WHEN lev <= {MAX_LEV} THEN 1 ELSE 0 END AS verified
    FROM pairs
    ORDER BY sdx, w1, w2
    """,
)
def phonetic_match_pairs(spark, sf_dir):
    """Soundex-blocked candidate word pairs from part names with the
    levenshtein verify flag (module docstring): blocking bounds the
    pair space to within-bucket, the edit distance scores each
    survivor."""
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    words = (
        part.select(F.explode(F.split(F.col("p_name"), " ")).alias("w"))
        .union(part.select(F.col("p_type").alias("w")))
        .union(nation.select(F.col("n_name").alias("w")))
        .distinct()
    )
    keyed = words.select("w", _soundex_spark(F.col("w")).alias("sdx"))
    a = keyed.alias("a")
    b = keyed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.sdx") == F.col("b.sdx")) & (F.col("a.w") < F.col("b.w")),
    ).select(
        F.col("a.sdx").alias("sdx"),
        F.col("a.w").alias("w1"),
        F.col("b.w").alias("w2"),
        F.levenshtein(F.col("a.w"), F.col("b.w")).alias("lev"),
    )
    return pairs.select(
        "sdx",
        "w1",
        "w2",
        "lev",
        F.when(F.col("lev") <= MAX_LEV, 1).otherwise(0).alias("verified"),
    ).orderBy("sdx", "w1", "w2")
