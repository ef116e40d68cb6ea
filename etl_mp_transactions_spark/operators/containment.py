"""Containment (near-subset) set-join — adaptive pair-stage engine.

The containment predicate C ≥ 0.9 in either direction (10·|A∩B| ≥
9·min(|A|,|B|), exact rational) admits two sound candidate/verify
strategies with *opposite* sweet spots, and the data decides which is
right — so the operator dispatches on a measured property of the
corpus (max per-(lang, source)-block distinct-token vocabulary, one
bounded 1-row collect, same class as the IVF seed picks):

**Bitmap path** (block vocab ≤ ``BITMAP_VOCAB_MAX``): dictionary-
encode each block's vocabulary to dense bit positions (per-block
row_number over the distinct tokens — a partitioned window over
vocab-sized partitions), pack every set into ``ceil(V/64)`` longs,
and verify pairs inline in the blocked self-join with
``bit_count(a & b)`` — a handful of ALU ops replacing an
array_intersect hash probe. On vocabulary-saturated corpora the
TRUE ANSWER is dense (measured here: output pairs grow ~102× at a
10× data step), so pair enumeration is output-bound and the win is
making the per-pair constant ~free, not pruning candidates a prefix
filter provably cannot prune (every set shares "rare" tokens with
every other when V ≈ |set|). Task-level parallelism survives block
skew through a G×G grid split: side A replicates each set G times
keyed (bucket(sid), g), side B keyed (g, bucket(sid)); each
unordered pair meets in exactly one of the G² grid cells, so a
single giant block fans out to G² tasks instead of one.

**Prefix path** (large vocabularies — real Zipfian text): the
asymmetric PPJoin prefix filter (same machinery as
``setsim_prefix_join``, queries/linkage.py, adapted to the
containment bound). A passing pair has inter ≥ q = ⌈0.9·ns⌉ for
ns = min side, so the larger side must share one of the smaller
side's ns − q + 1 globally-rarest tokens (df-asc, token-asc — one
total order per block). Each set INDEXES only its prefix (it may be
the pair's smaller side) and PROBES with all tokens (it may be the
larger); the (n, sid)-ordered join makes the index side strictly
smaller. The positional filter then bounds overlap by
1 + min(ns−ps, nl−pl) before any verify — sound because the
globally-smallest shared token of a passing pair is in the prefix
and attains MIN(ps), MIN(pl) on the same join row. Survivors verify
with one array_intersect.

Both paths emit identical rows (tests force each on the same input
and assert equality); the DuckDB oracle is the naive blocked
quadratic either way. Reference for the capability surface: the
O(n·m) pairwise similarity sweep in ``src/ai.py:42-60`` — here
generalized to asymmetric containment and made scale-adaptive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# bitmap path cap: 1024 bits = 16 longs = 128 B/set — above this the
# packed set outgrows the token array and the prefix index wins
BITMAP_VOCAB_MAX = 1024
# grid split factor: a skewed block's S²/2 pairs spread over G² tasks
GRID_G = 4

# exact integer ⌈9·n/10⌉ — the required overlap for the min side
_REQ = "div(9 * {n} + 9, 10)"

# Candidate-volume ceiling (VERDICT r12 task #6): the pair stage is
# output-bound by contract, but "output-bound" silently becomes the
# cost on a degenerate corpus — the sf10 synthetic sweep emitted
# 871M candidate rows (99× growth at a 10× step) because every
# language shares one small vocabulary, so near-everything is a
# candidate of near-everything. The guard computes a CHEAP upper
# bound of candidate volume (Σ df² per token for the prefix path,
# Σ n_b² per block for the bitmap path — tiny aggregations, no pair
# join) and trips loudly when it exceeds CAND_FACTOR×|sets|:
# on_overflow="error" raises (the capped_bucket detector discipline);
# "flag" (registry default) prints the measured degeneracy to stderr
# and proceeds, so scale sweeps on the synthetic corpus complete but
# never read as "covered everything quietly". SCALE.md quantifies.
CAND_FACTOR = 64


def _volume_guard(
    est: int, n_sets: int, path: str, on_overflow: str
) -> None:
    budget = CAND_FACTOR * max(n_sets, 1)
    if est <= budget:
        return
    msg = (
        f"containment {path} candidate-volume bound {est} exceeds"
        f" {CAND_FACTOR}x corpus ({budget} for {n_sets} sets):"
        " degenerate/shared vocabulary — the pair stage is"
        " output-bound and that output is itself the cost; shard the"
        " corpus, raise CAND_FACTOR knowingly, or pre-shingle to"
        " diversify tokens"
    )
    if on_overflow == "error":
        raise ValueError(msg)
    import sys

    print(f"WARN containment: {msg}", file=sys.stderr)


def doc_token_sets(docs: DataFrame):
    """Canonical distinct-token-set derivation over ``documents`` —
    the single source both the production query
    (queries/dedup.py ``dedup_containment_nearsubset``) and the
    path-equality tests use, so they provably exercise the same set
    ids. Returns ``(toks, sets)``: ``toks`` keeps ``doc_id`` for
    member re-expansion; ``sets`` is one row per distinct set with
    (lang, source, sid, tokens, n). The sid separator is "\\u0001"
    (not ""): separator-less concat_ws would alias distinct token
    arrays (["ab","c"] vs ["a","bc"]) to one sid."""
    toks = docs.select(
        "doc_id",
        "lang",
        "source",
        F.array_sort(
            F.array_distinct(F.split(F.col("text"), r"\s+"))
        ).alias("tokens"),
    ).withColumn("sid", F.md5(F.concat_ws("\u0001", F.col("tokens"))))
    sets = toks.dropDuplicates(["lang", "source", "sid"]).select(
        "lang",
        "source",
        "sid",
        "tokens",
        F.size("tokens").cast("bigint").alias("n"),
    )
    return toks, sets


def block_vocab_max(sets: DataFrame) -> int:
    """Max distinct-token vocabulary over (lang, source) blocks — the
    1-row dispatch probe (bounded collect, documented class)."""
    row = (
        sets.select("lang", "source", F.explode("tokens").alias("tok"))
        .groupBy("lang", "source")
        .agg(F.count_distinct("tok").alias("v"))
        .agg(F.max("v").alias("vmax"))
        .first()
    )
    return int(row["vmax"]) if row and row["vmax"] is not None else 0


def pairs_bitmap(
    sets: DataFrame, vmax: int, on_overflow: str = "flag"
) -> DataFrame:
    """Blocked self-join with dictionary-bitmap popcount verify.

    ``sets``: (lang, source, sid, tokens, n) distinct token-sets.
    Returns (lang, source, sid_a, sid_b, inter, na, nb) with
    sid_a < sid_b and the exact containment filter applied.
    """
    # materialize once (ADVICE r13): the guard's eager agg and the
    # build's multiple reads would otherwise each replay the
    # upstream explode+distinct lineage
    sets = sets.localCheckpoint(eager=True)
    # candidate volume bound for the blocked self-join: Σ n_b² over
    # blocks (tiny agg over block counts — no pair join)
    stats = (
        sets.groupBy("lang", "source")
        .agg(F.count("*").alias("nb"))
        .agg(
            F.sum(F.col("nb") * F.col("nb")).alias("est"),
            F.sum("nb").alias("n_sets"),
        )
        .collect()[0]
    )
    _volume_guard(
        int(stats["est"] or 0),
        int(stats["n_sets"] or 0),
        "bitmap",
        on_overflow,
    )
    nwords = (vmax + 63) // 64
    ex = sets.select(
        "lang", "source", "sid", "n", F.explode("tokens").alias("tok")
    )
    # per-block dense dictionary: vocab-sized partitions (≤ vmax rows)
    vocab = ex.select("lang", "source", "tok").distinct()
    wv = Window.partitionBy("lang", "source").orderBy("tok")
    tid = vocab.select(
        "lang",
        "source",
        "tok",
        (F.row_number().over(wv) - 1).alias("tid0"),
    )
    words = (
        ex.join(tid, ["lang", "source", "tok"])
        .groupBy(
            "lang",
            "source",
            "sid",
            "n",
            F.expr("CAST(div(tid0, 64) AS INT)").alias("w"),
        )
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT),"
                " CAST(pmod(tid0, 64) AS INT)))"
            ).alias("word")
        )
    )
    bm = words.groupBy("lang", "source", "sid", "n").agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias(
            "m"
        )
    ).select(
        "lang",
        "source",
        "sid",
        "n",
        F.transform(
            F.sequence(F.lit(0), F.lit(nwords - 1)),
            lambda i: F.coalesce(
                F.element_at("m", i.cast("int")),
                F.lit(0).cast("bigint"),
            ),
        ).alias("bm"),
    )
    # G×G grid: pair (x, y) meets exactly in cell (bkt(x), bkt(y))
    g = F.sequence(F.lit(0), F.lit(GRID_G - 1))
    # pmod alone is non-negative for negative hashes; abs(hash) would
    # raise ARITHMETIC_OVERFLOW under ANSI mode at hash == Int.MinValue
    bkt = F.pmod(F.hash("sid"), F.lit(GRID_G))
    a = bm.select(
        "lang",
        "source",
        bkt.alias("ga"),
        F.explode(g).alias("gb"),
        F.col("sid").alias("sid_a"),
        F.col("n").alias("na"),
        F.col("bm").alias("bma"),
    )
    b = bm.select(
        "lang",
        "source",
        F.explode(g).alias("ga"),
        bkt.alias("gb"),
        F.col("sid").alias("sid_b"),
        F.col("n").alias("nb"),
        F.col("bm").alias("bmb"),
    )
    inter = F.aggregate(
        F.zip_with("bma", "bmb", lambda x, y: F.bit_count(x.bitwiseAND(y))),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, ["lang", "source", "ga", "gb"])
        .filter(F.col("sid_a") < F.col("sid_b"))
        .select(
            "lang",
            "source",
            "sid_a",
            "sid_b",
            inter.alias("inter"),
            "na",
            "nb",
        )
        .filter(
            (F.col("inter") * 10 >= F.col("na") * 9)
            | (F.col("inter") * 10 >= F.col("nb") * 9)
        )
    )


def pairs_prefix(sets: DataFrame, on_overflow: str = "flag") -> DataFrame:
    """Asymmetric PPJoin prefix-index candidates + positional filter
    + array_intersect verify (module docstring). Same contract as
    :func:`pairs_bitmap`."""
    # materialize once (ADVICE r13): sets feeds the guard aggs, the
    # prefix index, and both verify arms — without this each replays
    # the upstream explode+distinct lineage
    sets = sets.localCheckpoint(eager=True)
    ex = sets.select(
        "lang", "source", "sid", "n", F.explode("tokens").alias("tok")
    )
    df_tok = ex.groupBy("lang", "source", "tok").agg(
        F.count("*").alias("df")
    )
    # candidate volume bound: a token with document frequency df can
    # pair at most df(probe)·df(index) ≤ df² rows — est and n_sets in
    # ONE aggregation over the token-frequency table (ADVICE r13:
    # n_sets = Σ df / mean-set-size is not derivable there, so count
    # distinct sets from the same checkpointed frame instead)
    stats = df_tok.agg(
        F.sum(F.col("df") * F.col("df")).alias("est")
    ).collect()[0]
    _volume_guard(
        int(stats["est"] or 0), sets.count(), "prefix", on_overflow
    )
    wp = Window.partitionBy("lang", "source", "sid").orderBy("df", "tok")
    ranked = ex.join(df_tok, ["lang", "source", "tok"]).select(
        "lang",
        "source",
        "sid",
        "n",
        "tok",
        F.row_number().over(wp).alias("p"),
    )
    # prefix length n − ⌈0.9n⌉ + 1: index only the rarest tokens
    idx = ranked.filter(
        F.col("p") <= F.col("n") - F.expr(_REQ.format(n="n")) + 1
    )
    cand = (
        ranked.alias("l")
        .join(
            idx.alias("s"),
            (F.col("l.lang") == F.col("s.lang"))
            & (F.col("l.source") == F.col("s.source"))
            & (F.col("l.tok") == F.col("s.tok"))
            & (
                F.struct(F.col("l.n"), F.col("l.sid"))
                > F.struct(F.col("s.n"), F.col("s.sid"))
            ),
        )
        .groupBy(
            F.col("l.lang").alias("lang"),
            F.col("l.source").alias("source"),
            F.col("s.sid").alias("sid_s"),
            F.col("l.sid").alias("sid_l"),
            F.col("s.n").alias("ns"),
            F.col("l.n").alias("nl"),
        )
        .agg(F.min("s.p").alias("ps"), F.min("l.p").alias("pl"))
    )
    pruned = cand.filter(
        1
        + F.least(F.col("ns") - F.col("ps"), F.col("nl") - F.col("pl"))
        >= F.expr(_REQ.format(n="ns"))
    ).select("lang", "source", "sid_s", "sid_l", "ns", "nl")
    s_arr = sets.select(
        "lang",
        "source",
        F.col("sid").alias("sid_s"),
        F.col("tokens").alias("ts"),
    )
    l_arr = sets.select(
        "lang",
        "source",
        F.col("sid").alias("sid_l"),
        F.col("tokens").alias("tl"),
    )
    inter = F.size(F.array_intersect("ts", "tl")).cast("bigint")
    verified = (
        pruned.join(s_arr, ["lang", "source", "sid_s"])
        .join(l_arr, ["lang", "source", "sid_l"])
        .select(
            "lang",
            "source",
            "sid_s",
            "sid_l",
            "ns",
            "nl",
            inter.alias("inter"),
        )
        .filter(
            (F.col("inter") * 10 >= F.col("ns") * 9)
            | (F.col("inter") * 10 >= F.col("nl") * 9)
        )
    )
    slt = F.col("sid_s") < F.col("sid_l")
    return verified.select(
        "lang",
        "source",
        F.when(slt, F.col("sid_s")).otherwise(F.col("sid_l")).alias("sid_a"),
        F.when(slt, F.col("sid_l")).otherwise(F.col("sid_s")).alias("sid_b"),
        "inter",
        F.when(slt, F.col("ns")).otherwise(F.col("nl")).alias("na"),
        F.when(slt, F.col("nl")).otherwise(F.col("ns")).alias("nb"),
    )


def containment_set_pairs(
    sets: DataFrame,
    force: str | None = None,
    on_overflow: str = "flag",
) -> DataFrame:
    """Dispatch: bitmap when every block's vocabulary packs into
    ≤ ``BITMAP_VOCAB_MAX`` bits, else the prefix index. ``force``
    ("bitmap" | "prefix") pins a path for tests/benchmarks;
    ``on_overflow`` ("flag" | "error") sets the candidate-volume
    guard's trip behavior (``_volume_guard``)."""
    if force == "prefix":
        return pairs_prefix(sets, on_overflow=on_overflow)
    if force == "bitmap":
        return pairs_bitmap(
            sets, block_vocab_max(sets), on_overflow=on_overflow
        )
    vmax = block_vocab_max(sets)
    if 0 < vmax <= BITMAP_VOCAB_MAX:
        return pairs_bitmap(sets, vmax, on_overflow=on_overflow)
    return pairs_prefix(sets, on_overflow=on_overflow)
