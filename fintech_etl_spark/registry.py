"""Query registry — the single source of truth behind ``__spark_entry__``.

Every implemented operator registers a :class:`QuerySpec`: a Spark
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
the equivalent ANSI SQL the DuckDB oracle runs on the same parquet
tables. Conventions that keep the driver's order-insensitive value-hash
stable across engines:

- every aggregated/computed double is ``round(x, 4)`` on BOTH sides;
- integer-ish aggregates are pinned to the same width (BIGINT/INT)
  on both sides;
- every computed column carries the same alias on both sides;
- ties in any top-k / row_number ordering are broken by a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver runs the weaker rows-only check
    doc: str = ""
    tags: tuple[str, ...] = ()


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


#: Operator families whose import registers their queries. Listed by
#: name so a family that fails to import (missing module during
#: development, absent optional dependency) degrades to "its queries
#: are not offered" instead of killing every entry point.
_OPERATOR_MODULES = (
    "analytics",
    "audit_ops",
    "corpus_ops",
    "dedup",
    "events_analytics",
    "graph_ops",
    "layout",
    "multimodal",
    "receipts_demo",
    "relational",
    "rules_demo",
    "similarity",
    "sources_ops",
    "text_analysis",
    "tpch_relational",
    "vectorized",
)


def all_specs() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and
    return the full registry."""
    import importlib

    # Imports are deferred so `import fintech_etl_spark` stays cheap.
    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(f"fintech_etl_spark.operators.{mod}")
        except ImportError as exc:  # family not built / optional dep missing
            import warnings

            warnings.warn(f"operator family '{mod}' unavailable: {exc}", stacklevel=2)
            continue

    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
