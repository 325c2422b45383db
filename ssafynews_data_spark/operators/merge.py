"""MERGE / CDC emulation without a transactional table format (guide:
'CDC / SCD2 → MERGE INTO (needs Delta; in v1 emulate with anti-join +
union + window)').

The reference's only write semantics is insert-ignore
(ON CONFLICT DO NOTHING, collect/consumer.py:81).  Real pipelines also
need *updates* — re-crawled articles, corrected categories.  Two
emulations:

- ``merge_upsert``: latest-wins upsert (UPDATE + INSERT) — the batch
  MERGE equivalent, one anti-join + union.
- ``scd2_apply``: slowly-changing-dimension type 2 — history preserved
  with validity ranges, current-row flag maintained by a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table


def merge_upsert(existing: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE (latest wins): rows of ``existing`` whose key is NOT in
    ``updates`` (anti-join), plus all of ``updates`` (deduped by key).
    Both legs shuffle on the key once; at scale write the result
    partitioned the same way as ``existing`` so the next merge's
    anti-join co-locates."""
    keep = existing.join(updates.select(key).distinct(), key, "left_anti")
    return keep.unionByName(updates.dropDuplicates([key]))


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    key: str,
    ts_col: str = "valid_from",
) -> DataFrame:
    """SCD2: append change rows, then recompute per-key validity:
    valid_to = next valid_from (lead), is_current = last row per key."""
    merged = history.unionByName(changes, allowMissingColumns=True)
    w = W.partitionBy(key).orderBy(ts_col)
    return (
        merged.withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


@register(
    "merge_upsert_orders",
    oracle="""
        WITH updates AS (
            -- flat-fee update: adding 100.0 to a 2-decimal double never
            -- creates new decimals, so no re-round (a x1.1 re-price hit
            -- .xx5 representational boundaries where Spark's HALF_UP-on-
            -- decimal and DuckDB's double-nearest round disagree by 1 cent)
            SELECT o_orderkey,
                   'P' AS o_orderstatus,
                   round(o_totalprice, 2) + 100.0 AS o_totalprice
            FROM orders WHERE o_orderkey % 10 = 0
        ),
        kept AS (
            SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
            FROM orders
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
        )
        SELECT * FROM kept
        UNION ALL
        SELECT * FROM updates
    """,
    tags=("merge", "cdc", "D2"),
)
def merge_upsert_orders(spark, sf_dir: str) -> DataFrame:
    """MERGE emulation under the oracle gate: synthesize an update set
    (every 10th order re-priced, status→'P'), merge latest-wins, and
    hash-match the merged table against plain SQL set logic."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.lit("P").alias("o_orderstatus"),
            (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
        )
    )
    return merge_upsert(orders, updates, "o_orderkey")


@register(
    "merge_scd2_orders",
    oracle="""
        WITH hist AS (
            SELECT o_orderkey, o_orderstatus, CAST(o_orderdate AS DATE) AS vf FROM orders
            UNION ALL
            SELECT o_orderkey, 'X' AS o_orderstatus, CAST(o_orderdate AS DATE) + 30 AS vf
            FROM orders WHERE o_orderkey % 10 = 0
        )
        SELECT o_orderkey, o_orderstatus,
               strftime(vf, '%Y-%m-%d') AS valid_from,
               strftime(lead(vf) OVER w, '%Y-%m-%d') AS valid_to,
               lead(vf) OVER w IS NULL AS is_current
        FROM hist
        WINDOW w AS (PARTITION BY o_orderkey ORDER BY vf)
    """,
    tags=("merge", "scd2", "cdc"),
)
def merge_scd2_orders(spark, sf_dir: str) -> DataFrame:
    """SCD2 under the oracle gate: every 10th order gets a status change
    30 days after its order date; ``scd2_apply`` appends the change rows
    and recomputes validity ranges (valid_to = next valid_from via lead,
    is_current = open-ended row).  Hash-matched against the plain-SQL
    window formulation.  At scale both legs shuffle once on the key —
    the same partitioning the history table is stored in."""
    orders = load_table(spark, sf_dir, "orders")
    history = orders.select(
        "o_orderkey", "o_orderstatus", F.to_date("o_orderdate").alias("valid_from")
    )
    changes = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("valid_from"),
    )
    out = scd2_apply(history, changes, "o_orderkey")
    return out.select(
        "o_orderkey",
        "o_orderstatus",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
        "is_current",
    )


def merge_into_delta(spark, target_path: str, updates: DataFrame, key: str) -> None:
    """Transactional MERGE INTO on a Delta table — the table-format-backed
    upgrade of ``merge_upsert`` (same semantics, ACID + concurrent-safe).

    Gated on ``delta-spark`` being importable AND the session having the
    Delta SQL extension; the test image ships neither the package nor
    network access to resolve the jar, so tests/test_delta_gated.py
    skips cleanly there and runs wherever delta resolves.
    """
    try:
        from delta.tables import DeltaTable
    except ImportError as e:  # pragma: no cover - exercised only sans delta
        raise RuntimeError(
            "delta-spark is not installed; use merge_upsert (anti-join "
            "emulation) or install delta-spark + spark.sql.extensions"
        ) from e

    (
        DeltaTable.forPath(spark, target_path)
        .alias("t")
        .merge(updates.alias("s"), f"t.{key} = s.{key}")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


@register(
    "pit_join_scd2",
    oracle="""
        WITH hist AS (
            SELECT o_orderkey, o_orderstatus, CAST(o_orderdate AS DATE) AS vf FROM orders
            UNION ALL
            SELECT o_orderkey, 'X', CAST(o_orderdate AS DATE) + 30
            FROM orders WHERE o_orderkey % 10 = 0
        ),
        dim AS (
            SELECT o_orderkey, o_orderstatus, vf,
                   lead(vf) OVER (PARTITION BY o_orderkey ORDER BY vf) AS vt
            FROM hist
        )
        SELECT o_orderstatus AS effective_status,
               count(*) AS n_lineitems,
               round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem
        JOIN dim ON l_orderkey = o_orderkey
                AND CAST(l_shipdate AS DATE) >= vf
                AND (vt IS NULL OR CAST(l_shipdate AS DATE) < vt)
        GROUP BY 1
        ORDER BY 1
    """,
    tags=("merge", "scd2", "temporal", "pit-join"),
)
def pit_join_scd2(spark, sf_dir: str) -> DataFrame:
    """Point-in-time join — how a consumer READS an SCD2 dimension:
    each lineitem picks the order-status version that was valid on its
    ship date (valid_from <= ship < valid_to, open-ended current row).
    Without this, a fact joined to is_current rows silently rewrites
    history (every pre-change shipment inherits the post-change
    status).  One equi-join on orderkey with the interval predicate as
    a residual — versions per key are few, so the residual prunes
    locally; at scale the fact and dim share the orderkey
    partitioning, same as the MERGE that maintains the dim."""
    orders = load_table(spark, sf_dir, "orders")
    history = orders.select(
        "o_orderkey", "o_orderstatus", F.to_date("o_orderdate").alias("valid_from")
    )
    changes = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("valid_from"),
    )
    dim = scd2_apply(history, changes, "o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship_d"), "l_extendedprice"
    )
    joined = li.join(
        dim,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("ship_d") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ship_d") < F.col("valid_to"))),
    )
    return (
        joined.groupBy(F.col("o_orderstatus").alias("effective_status"))
        .agg(
            F.count("*").alias("n_lineitems"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("effective_status")
    )


# ---------------------------------------------------------------------------
# Snapshot diff — the read side of CDC: given two snapshots of a table,
# classify every key as added / removed / changed / unchanged.
# ---------------------------------------------------------------------------

#: deterministic synthetic "next snapshot" of orders, mirrored bit-for-
#: bit in the DuckDB oracle: keys % 37 deleted, % 23 re-priced (+100.0,
#: an exact double op), % 41 re-inserted under key + 100_000_000.
_DIFF_DEL, _DIFF_UPD, _DIFF_INS, _DIFF_SHIFT = 37, 23, 41, 100_000_000


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    key: str,
    cols: list[str],
    carry: str | None = None,
) -> DataFrame:
    """(k, change_type, _any) for two snapshots: ONE co-partitioned full
    outer join on the key, then row-local classification over ``cols``
    (must be non-empty — with no compared columns there is no "changed"
    definition).  ``_any`` carries ``coalesce(a.carry, b.carry)`` for
    downstream aggregation; ``carry`` defaults to ``cols[0]``.
    At 100 TB both snapshots live bucketed by the key (the layout
    ``test_bucketed_join_has_no_exchange`` proves shuffle-free), so the
    diff is a zero-shuffle zip of co-located buckets plus a map — the
    same shape change-data-capture engines materialize."""
    if not cols:
        raise ValueError("snapshot_diff needs at least one compared column")
    carry = carry or cols[0]
    if carry not in cols:
        raise ValueError(f"carry column {carry!r} must be one of cols")
    # presence flags, NOT a data column: any compared column may be
    # legitimately NULL on a present row (planted-pair pytest pins this)
    an = a.select(
        F.col(key).alias("k"),
        F.lit(True).alias("_a"),
        *[F.col(c).alias(f"a_{c}") for c in cols],
    )
    bn = b.select(
        F.col(key).alias("k"),
        F.lit(True).alias("_b"),
        *[F.col(c).alias(f"b_{c}") for c in cols],
    )
    j = an.join(bn, "k", "full_outer")
    differs = None
    for c in cols:
        d = ~F.col(f"a_{c}").eqNullSafe(F.col(f"b_{c}"))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(F.col("_a").isNull(), "added")
        .when(F.col("_b").isNull(), "removed")
        .when(differs, "changed")
        .otherwise("unchanged")
    )
    return j.select("k", change.alias("change_type"),
                    F.coalesce(f"a_{carry}", f"b_{carry}").alias("_any"))


@register(
    "snapshot_diff_orders",
    oracle=f"""
        WITH a AS (SELECT * FROM orders),
             b AS (
                 SELECT o_orderkey, o_custkey, o_orderstatus,
                        CASE WHEN o_orderkey % {_DIFF_UPD} = 0
                             THEN o_totalprice + 100.0
                             ELSE o_totalprice END AS o_totalprice,
                        o_orderpriority
                 FROM a WHERE o_orderkey % {_DIFF_DEL} <> 0
                 UNION ALL
                 SELECT o_orderkey + {_DIFF_SHIFT}, o_custkey, o_orderstatus,
                        o_totalprice, o_orderpriority
                 FROM a WHERE o_orderkey % {_DIFF_INS} = 0
             ),
             j AS (
                 SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
                        CASE WHEN a.o_orderkey IS NULL THEN 'added'
                             WHEN b.o_orderkey IS NULL THEN 'removed'
                             WHEN a.o_custkey <> b.o_custkey
                               OR a.o_orderstatus <> b.o_orderstatus
                               OR a.o_totalprice <> b.o_totalprice
                               OR a.o_orderpriority <> b.o_orderpriority
                             THEN 'changed' ELSE 'unchanged' END AS change_type,
                        coalesce(a.o_custkey, b.o_custkey) AS ck
                 FROM a FULL JOIN b ON a.o_orderkey = b.o_orderkey
             )
        SELECT change_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(k) AS BIGINT) AS min_key,
               CAST(max(k) AS BIGINT) AS max_key,
               CAST(count(DISTINCT ck) AS BIGINT) AS n_custkeys
        FROM j GROUP BY change_type
    """,
    tags=("cdc", "diff", "join"),
)
def snapshot_diff_orders(spark, sf_dir: str) -> DataFrame:
    """CDC read-side diff of two orders snapshots: per change type, the
    row count, key range, and distinct-customer count.  Snapshot B is
    derived deterministically from A (delete / re-price / re-insert by
    key residues) with the IDENTICAL derivation in the DuckDB oracle,
    so the full-outer-join classification itself — null-side handling,
    field-wise change detection including the exact-double +100.0
    update — is what the hash check certifies.  Complements the write
    side (``merge_upsert_orders`` / ``merge_scd2_orders``): MERGE
    applies a diff, this computes one.  Scale shape: one key-partitioned
    full outer join (shuffle-free on bucketed snapshots) + a row-local
    CASE + a 4-group aggregate."""
    a = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    b = (
        a.filter(key % _DIFF_DEL != 0).select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.when(key % _DIFF_UPD == 0, F.col("o_totalprice") + 100.0)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderpriority",
        )
    ).unionByName(
        a.filter(key % _DIFF_INS == 0).select(
            (key + _DIFF_SHIFT).alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderpriority",
        )
    )
    cols = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    d = snapshot_diff(
        a.select("o_orderkey", *cols), b, "o_orderkey", cols, carry="o_custkey"
    )
    return d.groupBy("change_type").agg(
        F.count("*").alias("n"),
        F.min("k").cast("long").alias("min_key"),
        F.max("k").cast("long").alias("max_key"),
        F.count_distinct("_any").alias("n_custkeys"),
    )
