"""Merged / routed store views.

Reference: ``geomesa-index-api/.../view/MergedDataStoreView.scala`` +
``MergedQueryRunner.scala:39-100`` — a logical store that concatenates the
scan results of several physical stores, optionally routing a query to one
store by an attribute filter. Spark-first: a merged view is ``unionByName``
over the member DataFrames (allowMissingColumns for schema drift) and
routing is a partition-pruning filter applied per member before the union —
Catalyst pushes it into each member's scan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F


def merged_store_view(*members: DataFrame, allow_missing: bool = True) -> DataFrame:
    """Union of several stores' frames by column name."""
    if not members:
        raise ValueError("need at least one member store")
    out = members[0]
    for m in members[1:]:
        out = out.unionByName(m, allowMissingColumns=allow_missing)
    return out


def routed_view(
    members: dict[str, DataFrame],
    route_col: str = "__store",
) -> DataFrame:
    """Attribute-routed view: each member is tagged with its store name; a
    filter on ``route_col`` reaches only that member's scan (the others are
    pruned to empty scans by constant folding)."""
    tagged = [df.withColumn(route_col, F.lit(name)) for name, df in members.items()]
    return merged_store_view(*tagged)


def query_route(
    members: dict[str, DataFrame],
    router: Callable[[str], bool],
) -> DataFrame:
    """Driver-side routing (MergedQueryRunner's store filter): only members
    the router accepts participate in the scan at all."""
    selected = [df for name, df in members.items() if router(name)]
    if not selected:
        raise ValueError("router rejected every store")
    return merged_store_view(*selected)
