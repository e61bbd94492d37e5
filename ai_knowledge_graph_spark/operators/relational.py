"""Relational/warehouse analytics over the TPC-H-style tables.

The engine's KG/webtext surface rarely touches the classic warehouse
tables in the driver's test data (customer/orders/lineitem/nation); these
operators exercise the star-join + exact-money aggregation shapes those
tables exist for — broadcast dimension joins, cents-frozen revenue math
(double money summed in float is order-dependent; summed in int64 cents
it is exact and hash-reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# revenue term shared verbatim with the oracle: the float multiply chain
# happens per ROW on exact column values (same op order both sides), is
# frozen to cents, and only then summed — so aggregation order can't
# change the result.
REVENUE_CENTS_SQL = (
    "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
)


def revenue_by_nation(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """(n_name, n_orders, revenue_cents): the TPC-H Q5-shape star join —
    lineitem ⋈ orders ⋈ customer ⋈ nation, revenue per customer nation.

    Plan shape at 100 TB: the two fact-fact joins shuffle on their
    natural keys (orderkey, custkey); the nation dimension is
    broadcast (25 rows by spec); revenue freezes to int64 cents per row
    BEFORE the map-side-combined sum, so the money math is exact.
    """
    rev = lineitem.select(
        "l_orderkey", F.expr(REVENUE_CENTS_SQL).alias("cents")
    )
    return (
        rev.join(orders.select("o_orderkey", "o_custkey"),
                 rev.l_orderkey == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )
