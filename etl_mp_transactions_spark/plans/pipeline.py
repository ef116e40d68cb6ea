"""Declarative pipeline spec — the `theetl` analog (SURVEY.md §2.8).

The reference wires pipelines from YAML by dotted-name importing stage
functions with a ``list[dict] -> list[dict]`` contract
(``/root/reference/theetl/etl.py:24-105,133-184``). The engine keeps
the plugin idea but types stages at the DataFrame level:

    extraction:        (spark, params) -> DataFrame
    transformations:   DataFrame -> DataFrame   (applied via df.transform)
    filters:           DataFrame -> DataFrame
    loads:             DataFrame -> None

Because stages compose *lazily* into one logical plan, Catalyst
optimizes across stage boundaries — a filter declared in stage 4
still pushes down into the stage-1 scan. That is the structural win
over the reference's eager per-stage materialization: its YAML order
is a physical execution order; ours is just plan syntax.

Spec format (dict, e.g. parsed from YAML/JSON — no YAML dependency):

    {"transactions": {
        "extraction": "pkg.module.extract_fn",
        "transformations": ["pkg.module.fn1", "pkg.module.fn2"],
        "filters": ["pkg.module.filt"],
        "loads": ["pkg.module.sink"]}}
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


def resolve_stage(dotted: str) -> Callable:
    """Dotted-name → callable (the reference's importlib plugin loader,
    theetl/etl.py:64-86, with an actual error message)."""
    module_name, _, attr = dotted.rpartition(".")
    if not module_name:
        raise ValueError(f"stage {dotted!r} is not a dotted path")
    try:
        module = importlib.import_module(module_name)
    except ImportError as e:
        raise ImportError(f"stage module {module_name!r} not importable: {e}") from e
    try:
        return getattr(module, attr)
    except AttributeError as e:
        raise AttributeError(f"stage {attr!r} not found in {module_name!r}") from e


@dataclass
class PipelineSpec:
    extraction: str
    transformations: list[str] = field(default_factory=list)
    filters: list[str] = field(default_factory=list)
    loads: list[str] = field(default_factory=list)

    @classmethod
    def from_config(cls, config: dict, name: str) -> "PipelineSpec":
        if name not in config:
            raise KeyError(f"pipeline {name!r} not in config; have {list(config)}")
        c = config[name]
        return cls(
            extraction=c["extraction"],
            transformations=list(c.get("transformations", [])),
            filters=list(c.get("filters", [])),
            loads=list(c.get("loads", [])),
        )

    @classmethod
    def from_yaml(cls, path: str, name: str) -> "PipelineSpec":
        """YAML file → spec, reference config-format parity
        (theetl/etl.py:26-43 + 45-61: a list of named pipeline dicts).
        Both layouts are accepted: the reference's
        ``[{name: ..., extraction: ...}, ...]`` list and the mapping
        form ``{name: {extraction: ...}}``. Gated import: YAML support
        degrades to from_config(dict) where pyyaml is absent."""
        try:
            import yaml
        except ImportError as e:  # pragma: no cover - present in this env
            raise ImportError(
                "pyyaml not installed; parse the file yourself and use "
                "PipelineSpec.from_config"
            ) from e
        with open(path) as fh:
            raw = yaml.safe_load(fh)
        if isinstance(raw, list):  # the reference's layout
            raw = {c["name"]: c for c in raw}
        return cls.from_config(raw, name)


class Pipeline:
    """Composed DataFrame pipeline: extraction → transforms → filters
    as ONE lazy plan; loads fan out at the end (theetl/etl.py:171-184)."""

    def __init__(self, spec: PipelineSpec):
        self.spec = spec
        self._extract = resolve_stage(spec.extraction)
        self._transforms = [resolve_stage(s) for s in spec.transformations]
        self._filters = [resolve_stage(s) for s in spec.filters]
        self._loads = [resolve_stage(s) for s in spec.loads]

    @staticmethod
    def _apply(stage, df: DataFrame, params: dict):
        """Stages that declare ``wants_params = True`` receive the run's
        params dict as a second argument — per-run binding without
        module-global state (two pipelines can coexist in one
        process)."""
        if getattr(stage, "wants_params", False):
            return stage(df, params)
        return stage(df)

    def dataframe(self, spark: SparkSession, params: dict | None = None) -> DataFrame:
        """The logical plan up to (excluding) loads — lazily composed,
        so Catalyst sees the whole pipeline at once."""
        params = params or {}
        df = self._extract(spark, params)
        for stage in [*self._transforms, *self._filters]:
            df = self._apply(stage, df, params)
        return df

    def run(self, spark: SparkSession, params: dict | None = None) -> DataFrame:
        """Execute: build the plan, fan out to every load."""
        params = params or {}
        df = self.dataframe(spark, params)
        if self._loads:
            # one materialization shared across sinks
            df.persist()
            try:
                for load in self._loads:
                    self._apply(load, df, params)
            finally:
                df.unpersist()
        return df
