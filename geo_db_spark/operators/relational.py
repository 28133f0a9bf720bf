"""Generic relational operators covering the reference's post-phase SQL
battery (SURVEY.md §2 D1-D12; reference files cited per function).

Every helper is a pure DataFrame -> DataFrame derivation (the reference
mutates SQLite tables in place; lineage replaces UPDATE). All of them are
expressible with built-in expressions only — no Python UDFs — so the whole
post phase stays inside whole-stage codegen.

Scale notes baked into the implementations:
- window `row_number` over (partition key) is a single shuffle on the key
  and streams within each partition — no collect, no per-row driver loops
  (the reference's per-city loop, src/post/mod.rs:96-107, is the
  anti-pattern these replace).
- semi/anti joins against small tables get auto-broadcast under AQE; pass
  `broadcast_right=True` to force it when the caller knows the right side
  is a dimension.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _keys(on: str | Sequence[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def semi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    broadcast_right: bool = False,
) -> DataFrame:
    """Keep left rows that have a match in right.

    Reference: the keep-side of the NOT EXISTS deletes, e.g.
    src/post/city_countries.sql:2-7, src/post/cleanup/05.sql:2-6.
    """
    if broadcast_right:
        right = F.broadcast(right)
    return left.join(right, on=on, how="left_semi")


def anti_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    broadcast_right: bool = False,
) -> DataFrame:
    """Keep left rows with NO match in right (the NOT EXISTS delete itself).

    Reference: src/post/city_countries.sql:2-7, cleanup/07.sql:2-6,
    cleanup/08.sql:4-8 (SURVEY.md §2 D1/D12/F8).
    """
    if broadcast_right:
        right = F.broadcast(right)
    return left.join(right, on=on, how="left_anti")


def top_k_per_group(
    df: DataFrame,
    partition_by: str | Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """ORDER BY ... LIMIT k per group, via one shuffle + streaming window.

    Reference pattern: src/post/find_subdivision.sql:31 (k=1 DESC),
    src/post/per_city.sql:39-40 (k=2), src/post/esperanto_city_labels.sql:16-17
    (k=1, boolean-expression sort). Callers must pass a total order
    (include a unique tiebreak column) for deterministic results — SQLite
    leaves ties arbitrary; we document the tiebreak instead (SURVEY.md §4).
    """
    w = Window.partitionBy(*_keys(partition_by)).orderBy(*order_by)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    out = ranked.filter(F.col("__rn") <= k)
    if rank_col is not None:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def argmin_per_group(
    df: DataFrame,
    partition_by: str | Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Pick the single min row per group (deterministic under a total order).

    Reference: per-city MIN(priority) country pick,
    src/post/city_countries.sql:9-23 (SURVEY.md §2 D2).
    """
    return top_k_per_group(df, partition_by, order_by, k=1)


def ordered_group_concat(
    df: DataFrame,
    group_by: str | Sequence[str],
    value: str,
    order_by: Sequence[str | Column],
    sep: str = " / ",
    out_col: str = "concat",
    distinct: bool = True,
) -> DataFrame:
    """DISTINCT + GROUP_CONCAT(value, sep) with a *defined* order.

    Reference: src/post/city_labels.sql:5-25 (SURVEY.md §2 D5). SQLite's
    GROUP_CONCAT order is unspecified; we sort by ``order_by`` then take the
    first occurrence of each distinct value, which reproduces the
    insertion-order behaviour the reference relies on while being stable.

    Implementation: collect (order_key..., value) structs per group, sort
    the array (JVM-side, per-group), project the value, de-dup preserving
    order. One shuffle on the group key; no window needed.
    """
    keys = _keys(group_by)
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    packed = F.struct(*order_cols, F.col(value).alias("__v"))
    agg = df.groupBy(*keys).agg(F.sort_array(F.collect_list(packed)).alias("__arr"))
    vals = F.transform(F.col("__arr"), lambda s: s["__v"])
    if distinct:
        # array_distinct keeps first occurrence => order preserved
        vals = F.array_distinct(vals)
    return agg.select(*keys, F.array_join(vals, sep).alias(out_col))


def salted_ordered_concat(
    df: DataFrame,
    group_by: str | Sequence[str],
    value: str,
    order_by: Sequence[str],
    sep: str = " / ",
    out_col: str = "concat",
    distinct: bool = True,
    n_salts: int = 8,
) -> DataFrame:
    """`ordered_group_concat` for SKEWED keys: the two-phase salted
    aggregation shape for aggregates with NO map-side partial form.

    count/sum/min salting is pointless in Spark (partial aggregation
    already combines map-side), but collect_list has no partial: every
    row of a hot key lands on ONE reducer. Salting fixes the row flood:
    phase 1 groups by (key, salt=hash(order cols) % n) so a hot key's
    rows spread over n reducers, each building a sorted chunk; phase 2
    merges at most n CHUNK ROWS per key (flatten + one array sort).
    The bytes still meet at one reducer — unavoidable for a concat —
    but as ≤n pre-built arrays, not millions of rows through a
    sort-based aggregate.

    Result is IDENTICAL to ordered_group_concat (the oracle-gated
    query asserts it): sorting the flattened struct array reproduces
    the global order, and array_distinct keeps first occurrence."""
    keys = _keys(group_by)
    order_cols = [F.col(c) for c in order_by]
    salt = F.pmod(F.xxhash64(*order_cols, F.col(value)), F.lit(n_salts))
    packed = F.struct(*order_cols, F.col(value).alias("__v"))
    chunks = df.groupBy(*keys, salt.alias("__salt")).agg(
        F.sort_array(F.collect_list(packed)).alias("__chunk")
    )
    merged = chunks.groupBy(*keys).agg(
        F.sort_array(F.flatten(F.collect_list("__chunk"))).alias("__arr")
    )
    vals = F.transform(F.col("__arr"), lambda s: s["__v"])
    if distinct:
        vals = F.array_distinct(vals)
    return merged.select(*keys, F.array_join(vals, sep).alias(out_col))


def prioritized_pick(
    df: DataFrame,
    partition_by: str | Sequence[str],
    preference: Column,
    tiebreak: Sequence[Column],
) -> DataFrame:
    """Per group, pick the row maximizing a boolean/ordinal preference.

    Reference: Esperanto-first label pick,
    src/post/esperanto_city_labels.sql:5-21 (`ORDER BY lang='eo' DESC
    LIMIT 1`; SURVEY.md §2 D8). ``tiebreak`` makes the non-preferred winner
    deterministic (documented divergence from SQLite's arbitrary pick).
    """
    return top_k_per_group(df, partition_by, [preference.desc(), *tiebreak], k=1)


def dedup_by_key(
    df: DataFrame,
    key: Sequence[str],
    prefer_order: Sequence[Column] | None = None,
) -> DataFrame:
    """PK-conflict-ignore semantics: one row per key.

    Reference: INSERT OR IGNORE / ON CONFLICT DO NOTHING sinks
    (src/database.rs:101-109,134) and the rekey dedups
    (src/post/cleanup/02.sql, 03.sql; SURVEY.md §2 D10). SQLite keeps the
    first-inserted row (arbitrary under parallel ingest); with
    ``prefer_order`` we keep the first row under that order instead —
    deterministic. Without it, a plain dropDuplicates (cheaper: map-side
    partial dedup, no window).
    """
    if prefer_order is None:
        return df.dropDuplicates(list(key))
    return top_k_per_group(df, list(key), list(prefer_order), k=1)


def join_replace_column(
    df: DataFrame,
    mapping: DataFrame,
    on: str | Sequence[str],
    replace: str,
    with_col: str,
    how: str = "inner",
    broadcast_mapping: bool = True,
) -> DataFrame:
    """Join-update: replace ``df[replace]`` with ``mapping[with_col]``.

    Reference: UPDATE ... SET col = (SELECT ...) join-updates, e.g.
    src/post/subdivision_iso.sql:5-12, cleanup/05.sql:8-14
    (SURVEY.md §2 D9/D11).
    """
    m = mapping.select(*_keys(on), F.col(with_col).alias("__new"))
    if broadcast_mapping:
        m = F.broadcast(m)
    out = df.join(m, on=_keys(on), how=how)
    return out.withColumn(replace, F.col("__new")).drop("__new")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 8,
    salt_by: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with manual salting for extreme key skew.

    ``skewed`` (the big side with hot keys) gets a deterministic salt —
    xxhash64 of ``salt_by`` (default: all its columns) mod ``n_salts`` —
    and ``other`` is replicated once per salt value; the join key becomes
    (on..., salt), splitting each hot key's rows across ``n_salts``
    shuffle partitions. Result set is IDENTICAL to the plain join
    (every skewed row finds its replica), at the cost of an
    ``n_salts``-fold replication of the other side.

    When to reach for this instead of AQE's skew-join split
    (spark.sql.adaptive.skewJoin, on by default in session.tune): AQE
    only splits SORT-MERGE join partitions after seeing runtime sizes,
    and cannot split an aggregation that follows the join on the same
    key; salting moves the fix into the plan itself — it also de-skews
    a downstream groupBy on (on..., salt) before the final re-combine.

    Deterministic: the salt is a pure function of row content, never
    rand(); identical reruns produce identical partitioning (and so do
    the driver's hash checks).
    """
    # right/full outer would emit each unmatched OTHER row once per salt
    # replica — a silent row-count bug, so refuse those join types
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; {how!r} would duplicate "
            "unmatched replicated-side rows once per salt"
        )
    keys = _keys(on)
    salt_cols = [F.col(c) for c in (salt_by or skewed.columns)]
    left = skewed.withColumn("__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)))
    right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return left.join(right, [*keys, "__salt"], how).drop("__salt")
