"""Both containment pair-stage paths (dictionary-bitmap popcount vs
asymmetric prefix index, operators/containment.py) must emit
IDENTICAL rows on the same input — the saturated-vocabulary corpus
family only auto-exercises the bitmap path, so the prefix path gets
its exact-equality coverage here, forced, including on a synthetic
Zipfian fixture large-vocab enough that the auto-dispatch itself
would choose it."""

from etl_mp_transactions_spark.operators import containment
from etl_mp_transactions_spark.sources.tables import load_table


def _sets(spark, sf_dir):
    # the exact production set derivation (shared helper) -- the test
    # exercises the same sid recipe as dedup_containment_nearsubset
    docs = load_table(spark, sf_dir, "documents")
    _, sets = containment.doc_token_sets(docs)
    return sets


def _rows(df):
    return sorted(
        tuple(r) for r in df.select(
            "sid_a", "sid_b", "inter", "na", "nb"
        ).collect()
    )


def test_bitmap_and_prefix_paths_agree(spark, sf_dir):
    sets = _sets(spark, sf_dir)
    bm = _rows(containment.containment_set_pairs(sets, force="bitmap"))
    px = _rows(containment.containment_set_pairs(sets, force="prefix"))
    assert len(bm) > 0  # fixture must actually contain near-subsets
    assert bm == px


def test_dispatch_picks_bitmap_on_saturated_corpus(spark, sf_dir):
    sets = _sets(spark, sf_dir)
    vmax = containment.block_vocab_max(sets)
    assert 0 < vmax <= containment.BITMAP_VOCAB_MAX


def test_paths_agree_on_zipfian_fixture(spark):
    # 60 docs over a ~1500-token vocabulary (doc-indexed suffixes) in
    # one block, with planted near-subset pairs: doc 3i+1 drops one
    # token of doc 3i (containment 1.0 from the subset side), doc
    # 3i+2 is disjoint filler. Vocab > BITMAP_VOCAB_MAX so the
    # dispatcher itself must route to the prefix path.
    rows = []
    for i in range(20):
        base = [f"t{i}_{j}" for j in range(25)]
        rows.append((f"d{3 * i}", "en", "s", " ".join(base)))
        rows.append((f"d{3 * i + 1}", "en", "s", " ".join(base[1:])))
        filler = [f"f{i}_{j}" for j in range(50)]
        rows.append((f"d{3 * i + 2}", "en", "s", " ".join(filler)))
    docs = spark.createDataFrame(
        rows, ["doc_id", "lang", "source", "text"]
    )
    _, sets = containment.doc_token_sets(docs)
    assert containment.block_vocab_max(sets) > containment.BITMAP_VOCAB_MAX
    bm = _rows(containment.containment_set_pairs(sets, force="bitmap"))
    px = _rows(containment.containment_set_pairs(sets, force="prefix"))
    auto = _rows(containment.containment_set_pairs(sets))
    assert len(px) == 20  # exactly the planted subset pairs
    assert bm == px == auto
