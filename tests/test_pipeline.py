"""Pipeline-spec framework (theetl analog, SURVEY.md §2.8): dotted-name
stage resolution, lazy composition, load fan-out."""

import pytest
from pyspark.sql import functions as F

from etl_mp_transactions_spark.plans.pipeline import Pipeline, PipelineSpec, resolve_stage

# --- stage functions the spec resolves by dotted name ---
_SINK_CALLS = []


def extract_numbers(spark, params):
    n = params.get("n", 10)
    return spark.range(n).withColumnRenamed("id", "v")


def double_it(df):
    return df.withColumn("v", F.col("v") * 2)


def keep_big(df):
    return df.filter(F.col("v") >= 10)


def collect_sink(df):
    _SINK_CALLS.append(df.count())


CONFIG = {
    "numbers": {
        "extraction": "tests.test_pipeline.extract_numbers",
        "transformations": ["tests.test_pipeline.double_it"],
        "filters": ["tests.test_pipeline.keep_big"],
        "loads": ["tests.test_pipeline.collect_sink"],
    }
}


def test_resolve_stage_errors():
    with pytest.raises(ValueError):
        resolve_stage("notdotted")
    with pytest.raises(ImportError):
        resolve_stage("no.such.module.fn")
    with pytest.raises(AttributeError):
        resolve_stage("tests.test_pipeline.nope")


def test_pipeline_composes_lazily(spark):
    spec = PipelineSpec.from_config(CONFIG, "numbers")
    pipe = Pipeline(spec)
    df = pipe.dataframe(spark, {"n": 10})
    # 0..9 doubled -> 0..18 step 2; >= 10 -> {10,12,14,16,18}
    assert sorted(r["v"] for r in df.collect()) == [10, 12, 14, 16, 18]


def test_pipeline_run_invokes_loads(spark):
    _SINK_CALLS.clear()
    Pipeline(PipelineSpec.from_config(CONFIG, "numbers")).run(spark, {"n": 10})
    assert _SINK_CALLS == [5]


def test_unknown_pipeline_name():
    with pytest.raises(KeyError):
        PipelineSpec.from_config(CONFIG, "missing")


def test_from_yaml_reference_list_layout(spark, tmp_path):
    # the reference's YAML layout: a list of named pipeline dicts
    # (theetl/etl.py:33 uses next(item for item if item['name']==...))
    p = tmp_path / "etl.yaml"
    p.write_text(
        """
- name: numbers
  extraction: tests.test_pipeline.extract_numbers
  transformations:
    - tests.test_pipeline.double_it
  filters:
    - tests.test_pipeline.keep_big
"""
    )
    spec = PipelineSpec.from_yaml(str(p), "numbers")
    out = Pipeline(spec).dataframe(spark, {"n": 8})
    assert [r["v"] for r in out.collect()] == [10, 12, 14]


def test_from_yaml_mapping_layout(spark, tmp_path):
    p = tmp_path / "etl.yaml"
    p.write_text(
        """
numbers:
  extraction: tests.test_pipeline.extract_numbers
"""
    )
    spec = PipelineSpec.from_yaml(str(p), "numbers")
    assert Pipeline(spec).dataframe(spark, {"n": 3}).count() == 3
