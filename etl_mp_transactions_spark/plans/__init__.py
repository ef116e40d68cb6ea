from etl_mp_transactions_spark.plans.pipeline import Pipeline, PipelineSpec, resolve_stage

__all__ = ["Pipeline", "PipelineSpec", "resolve_stage"]
