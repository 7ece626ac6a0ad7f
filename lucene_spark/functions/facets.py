"""Drill-down / drill-sideways faceting — the facet module's navigation
queries (facet/src/java/org/apache/lucene/facet/DrillDownQuery.java,
DrillSideways.java) over flat dimension columns of the docs table
(FacetsConfig's default non-hierarchical dims).

- drill_down: base matches filtered by EVERY selected dimension value
  (DrillDownQuery adds one FILTER clause per dim, OR across that dim's
  selected values).
- drill_sideways: for each dim, facet counts computed with that dim's OWN
  filter removed but every other dim's filter applied (DrillSideways'
  near-miss counting), so the UI can offer sibling values; dims with no
  filter are counted under the full drill-down set.

All joins/filters are JVM column expressions; the dims table is the docs
table (tiny projection), so each sideways count is one semi-join + groupBy.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import DataFrame, functions as F


def _apply_filters(
    matches: DataFrame, dims: DataFrame, filters: Dict[str, Sequence[str]],
    skip: str | None = None,
) -> DataFrame:
    out = matches
    for dim, values in filters.items():
        if dim == skip:
            continue
        sel = dims.filter(F.col(dim).isin(list(values))).select("doc_id")
        out = out.join(sel, "doc_id", "left_semi")
    return out


def drill_down(
    matches: DataFrame, dims: DataFrame, filters: Dict[str, Sequence[str]]
) -> DataFrame:
    """Base matches constrained by every dimension filter -> (doc_id, score)."""
    return _apply_filters(matches, dims, filters)


def taxonomy_counts(
    matches: DataFrame, dims: DataFrame, path_col: str, sep: str = "/"
) -> DataFrame:
    """Hierarchical taxonomy counts (facet/taxonomy: FacetsConfig
    hierarchical dims + TaxonomyFacetCounts): every PREFIX of a doc's
    ``sep``-separated path accumulates the doc — e.g. path 'en/src1' counts
    under both 'en' and 'en/src1'. One explode over path depth (tiny) + one
    count aggregation; getTopChildren(path) is then a prefix filter over
    the result."""
    parts = F.split(F.col(path_col), sep)
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, F.lit(1), i), sep),
    )
    return (
        matches.select("doc_id")
        .distinct()
        .join(dims.select("doc_id", path_col), "doc_id")
        .select(F.explode(prefixes).alias("path"))
        .groupBy("path")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy("path")
    )


def drill_sideways(
    matches: DataFrame,
    dims: DataFrame,
    filters: Dict[str, Sequence[str]],
    facet_dims: List[str],
) -> DataFrame:
    """(dim, label, cnt): for each facet dim, counts over the drill-down set
    with that dim's own filter lifted (near-miss counts)."""
    parts = []
    for dim in facet_dims:
        base = _apply_filters(matches, dims, filters, skip=dim)
        parts.append(
            base.join(dims.select("doc_id", dim), "doc_id")
            .groupBy(F.col(dim).alias("label"))
            .agg(F.count("*").cast("long").alias("cnt"))
            .select(F.lit(dim).alias("dim"), "label", "cnt")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("dim", "label")


def long_value_counts(
    matches: DataFrame,
    dims: DataFrame,
    value_expr: str,
    top_n: int | None = None,
) -> DataFrame:
    """LongValueFacetCounts (facet/LongValueFacetCounts.java): count per
    distinct long value of ``value_expr`` (a Spark SQL expression over the
    docs columns — the LongValuesSource role) across the matching docs.
    Docs where the expression is NULL contribute nothing (advanceExact
    false skips the doc). ``top_n`` set → getTopChildrenSortByCount order
    (count desc, value asc, :295-310); unset → getAllChildrenSortByValue
    (value asc, :343-370). Array-typed expressions explode first (the
    MultiLongValuesSource path — each emitted value counts).
    → (value long, cnt long)"""
    vals = dims.selectExpr("doc_id", f"({value_expr}) AS __v")
    from pyspark.sql.types import ArrayType

    if isinstance(vals.schema["__v"].dataType, ArrayType):
        vals = vals.select("doc_id", F.explode("__v").alias("__v"))
    counted = (
        matches.select("doc_id")
        .join(vals, "doc_id")
        .filter(F.col("__v").isNotNull())
        .groupBy(F.col("__v").cast("long").alias("value"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    if top_n is not None:
        return counted.orderBy(F.desc("cnt"), F.asc("value")).limit(int(top_n))
    return counted.orderBy("value")


def sum_associations(
    matches: DataFrame,
    assoc: DataFrame,
    top_n: int | None = None,
    float_values: bool = False,
) -> DataFrame:
    """Association facets (facet/taxonomy/TaxonomyFacetSumIntAssociations
    .java:50-88, TaxonomyFacetSumFloatAssociations.java): per-category sum
    of the association values attached to each matching doc. ``assoc`` is
    the association table (doc_id, cat, value) — the AssociationFacetField
    payload as a relation instead of BinaryDocValues bytes. Int sums are
    exact in any order; float sums accumulate in DOUBLE here (documented
    divergence: the reference folds float32 in doc order — values agree to
    float rounding, ~1e-7 relative). Order: sum desc, cat asc (the
    getTopChildren sort). → (cat string, total long|double)"""
    total = (
        F.sum(F.col("value").cast("double")).alias("total")
        if float_values
        else F.sum(F.col("value").cast("long")).alias("total")
    )
    out = (
        matches.select("doc_id")
        .join(assoc.select("doc_id", "cat", "value"), "doc_id")
        .groupBy("cat")
        .agg(total)
        .orderBy(F.desc("total"), F.asc("cat"))
    )
    if top_n is not None:
        out = out.limit(int(top_n))
    return out
