"""Mergeable frequent-items (heavy-hitter) sketches — the top-k member
of the sketch-cube family (HLL distinct counts in ``profiling``,
t-digest quantiles in ``quantiles``).

"Top selling items per region per week" over arbitrary slices normally
re-shuffles the fact per question. This keeps one bounded summary per
fine-grained group — the SpaceSaving/Misra-Gries idea realized as exact
per-partition counts truncated to the ``m`` heaviest items plus the
TRUNCATED MASS — and answers any coarser top-k by merging summaries:
sum counts by item, re-truncate, accumulate the dropped mass. The
stored count of a surviving item is a LOWER bound and
``count + dropped_mass`` an UPPER bound on its true frequency, so any
item whose true count exceeds the group's ``dropped_mass`` is
GUARANTEED present (the Misra-Gries guarantee with error ≤ truncated
mass ≤ n·(#distinct-seen/partition)/m shape).

Scale shape: mapInPandas partial summaries (exact pandas value_counts
per partition-group — map-side combine, the raw values never shuffle),
ONE merge shuffle of O(m) rows per partition-group, rollups over the
O(groups·m) summary table only. Deterministic: truncation breaks count
ties by item value, and merging the same partials is bit-stable; a
different input partitioning truncates different tails (within the
bound) — the HLL/t-digest contract, never assert cross-partitioning
equality.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SKETCH_FIELDS = [
    T.StructField("items", T.ArrayType(T.StringType(), False), False),
    T.StructField("counts", T.ArrayType(T.LongType(), False), False),
    T.StructField("dropped_mass", T.LongType(), False),
    T.StructField("n_total", T.LongType(), False),
]


def _truncate(counter: dict, m: int):
    """Keep the m heaviest (count desc, item asc — deterministic ties);
    return (items, counts, dropped_mass)."""
    ranked = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = ranked[:m]
    dropped = sum(c for _, c in ranked[m:])
    return [i for i, _ in kept], [int(c) for _, c in kept], int(dropped)


def _out_schema(df: DataFrame, group_cols: list[str]) -> T.StructType:
    return T.StructType([df.schema[c] for c in group_cols] + list(_SKETCH_FIELDS))


def topk_sketch_rollup(
    df: DataFrame, group_cols: list[str], item_col: str, m: int = 64
) -> DataFrame:
    """One bounded summary per group:
    ``(group…, items, counts, dropped_mass, n_total)``. NULL items are
    ignored. One shuffle (the partial merge); raw values never shuffle."""
    cols = [*group_cols, item_col]
    out_schema = _out_schema(df, group_cols)
    names = [f.name for f in out_schema.fields]

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, dict] = {}
        totals: dict[tuple, int] = {}
        for pdf in batches:
            pdf = pdf[pdf[item_col].notna()]
            for key, g in pdf.groupby(group_cols, dropna=False, sort=False):
                k = key if isinstance(key, tuple) else (key,)
                c = acc.setdefault(k, {})
                for item, n in g[item_col].astype(str).value_counts().items():
                    c[item] = c.get(item, 0) + int(n)
                totals[k] = totals.get(k, 0) + int(len(g))
        rows = []
        for k, counter in acc.items():
            items, counts, dropped = _truncate(counter, m)
            rows.append((*k, items, counts, dropped, totals[k]))
        yield pd.DataFrame(rows, columns=names)

    partials = df.select(*cols).mapInPandas(build, out_schema)
    return merge_topk_sketches(partials, group_cols, m)


def merge_topk_sketches(
    sketches: DataFrame, group_cols: list[str], m: int = 64
) -> DataFrame:
    """Roll summaries up to a coarser grain (or merge per-batch
    summaries): sum counts by item, re-truncate, accumulate dropped
    mass. Touches only the O(groups·m) summary table."""
    out_schema = _out_schema(sketches, group_cols)
    names = [f.name for f in out_schema.fields]

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        counter: dict = {}
        dropped = 0
        for items, counts, d in zip(pdf["items"], pdf["counts"],
                                    pdf["dropped_mass"]):
            dropped += int(d)
            for i, c in zip(items, counts):
                counter[i] = counter.get(i, 0) + int(c)
        items, counts, d2 = _truncate(counter, m)
        row = (*key, items, counts, dropped + d2, int(pdf["n_total"].sum()))
        return pd.DataFrame([row], columns=names)

    return sketches.groupBy(*group_cols).applyInPandas(merge, out_schema)


def sketch_topk(sketches: DataFrame, k: int) -> DataFrame:
    """Explode each summary's k heaviest items with their frequency
    bounds: ``count_lo`` (stored count, a lower bound) and ``count_hi``
    (``count_lo + dropped_mass``, the upper bound). ``rank`` is 1-based
    by (count_lo desc, item asc)."""
    group_cols = [
        f.name for f in sketches.schema.fields
        if f.name not in {"items", "counts", "dropped_mass", "n_total"}
    ]
    z = F.arrays_zip(F.col("items").alias("item"), F.col("counts").alias("c"))
    exploded = sketches.select(
        *group_cols, "dropped_mass", "n_total",
        F.posexplode(F.slice(z, 1, k)).alias("_pos", "_e"),
    )
    return exploded.select(
        *group_cols,
        (F.col("_pos") + 1).alias("rank"),
        F.col("_e.item").alias("item"),
        F.col("_e.c").alias("count_lo"),
        (F.col("_e.c") + F.col("dropped_mass")).alias("count_hi"),
        "n_total",
    )


def association_rules(
    df: DataFrame,
    basket_cols: list[str],
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Pairwise association rules over baskets (Agrawal et al. 1993,
    restricted to 2-itemsets — the scale-sane tier: k-itemset lattices
    explode combinatorially, while item PAIRS bound the work at
    O(Σ basket_size²) with small baskets): for each ordered pair
    (antecedent, consequent) of distinct items co-occurring in at least
    ``min_support`` baskets, ``support_pair``/``support_a`` counts,
    ``confidence`` = s_ab/s_a and ``lift`` = s_ab·N/(s_a·s_b) — both as
    single divisions of exact integers (decimal product for the lift
    numerator), bit-identical across engines.

    Scale shape: one distinct (basket, item) shuffle, pair generation
    as a map-only self zip over each basket's sorted item array (never
    a basket×basket join), one pair partial-agg shuffle, two
    item-support joins (item vocabulary — AQE broadcasts), a 1-row N
    broadcast."""
    basket = F.struct(*[F.col(c) for c in basket_cols])
    bi = (
        df.select(basket.alias("_b"), F.col(item_col).alias("_i"))
        .filter(F.col("_i").isNotNull())
        .distinct()
    )
    items = bi.groupBy("_b").agg(F.array_sort(F.collect_set("_i")).alias("_is"))
    n = items.agg(F.count(F.lit(1)).alias("_n"))
    pairs = (
        items.select(
            F.explode(F.flatten(F.transform(
                F.col("_is"),
                lambda a: F.filter(
                    F.transform(F.col("_is"),
                                lambda b: F.struct(a.alias("ia"), b.alias("ib"))),
                    lambda s: s["ia"] != s["ib"],
                ),
            ))).alias("_p"))
        .groupBy(F.col("_p.ia").alias("antecedent"),
                 F.col("_p.ib").alias("consequent"))
        .agg(F.count(F.lit(1)).alias("support_pair"))
        .filter(F.col("support_pair") >= min_support)
    )
    sup = bi.groupBy("_i").agg(F.count(F.lit(1)).alias("_s"))
    sa = sup.select(F.col("_i").alias("antecedent"), F.col("_s").alias("support_a"))
    sb = sup.select(F.col("_i").alias("consequent"), F.col("_s").alias("support_b"))
    return (
        pairs.join(sa, "antecedent").join(sb, "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent", "consequent",
            F.col("support_pair").cast("long").alias("support_pair"),
            F.col("support_a").cast("long").alias("support_a"),
            F.col("support_b").cast("long").alias("support_b"),
            (F.col("support_pair").cast("double") / F.col("support_a"))
            .alias("confidence"),
            ((F.col("support_pair").cast("decimal(19,0)")
              * F.col("_n").cast("decimal(19,0)")).cast("double")
             / (F.col("support_a").cast("decimal(19,0)")
                * F.col("support_b").cast("decimal(19,0)")).cast("double"))
            .alias("lift"),
        )
    )
