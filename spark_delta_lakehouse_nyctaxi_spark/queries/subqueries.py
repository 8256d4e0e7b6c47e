"""Subquery shapes (NOTES.md round-2 items): having-subquery join
(TPC-H Q18), correlated EXISTS / NOT EXISTS, and scalar subqueries.

These run through ``spark.sql`` over temp views on purpose — the point
is Catalyst's subquery handling: correlated EXISTS/NOT EXISTS
decorrelate to left-semi / left-anti joins, scalar subqueries become
broadcast one-row joins, and the Q18 having-join's small aggregated
side is broadcast by AQE at runtime. The same SQL (modulo decimal
casts) runs on the DuckDB oracle.

Scale notes: every shape here is one shuffle per aggregate plus joins
Catalyst is free to reorder; nothing is driver-side. The scalar
subquery avoids AVG on doubles (engine-dependent rounding) by
cross-multiplying exact decimal sums.
"""

from __future__ import annotations

from ..sources.readers import load_table
from . import register


def _views(spark, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_v")


@register(
    "q_tpch_q18",
    """
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           o_totalprice, sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(22,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(22,2))) > 250
    ) big ON o_orderkey = l_orderkey
    """,
    doc="TPC-H Q18 shape (large-volume customers): groupBy+HAVING "
        "subquery joined back to orders/customer. The having side "
        "shrinks from |lineitem| groups to a few hundred rows — AQE "
        "broadcasts it at runtime.",
)
def q_tpch_q18(spark, sf_dir):
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        SELECT c_name, c_custkey, o_orderkey,
               CAST(o_orderdate AS DATE) AS order_date,
               o_totalprice, sum_qty
        FROM customer_v
        JOIN orders_v ON c_custkey = o_custkey
        JOIN (
          SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(22,2))) AS DOUBLE) AS sum_qty
          FROM lineitem_v
          GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(22,2))) > 250
        ) big ON o_orderkey = l_orderkey
        """
    )


@register(
    "q_exists_subquery",
    """
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    GROUP BY n_name
    """,
    doc="Correlated EXISTS — Catalyst decorrelates to a left-semi join "
        "(per-nation count of customers with a 200k+ order).",
)
def q_exists_subquery(spark, sf_dir):
    _views(spark, sf_dir, "customer", "nation", "orders")
    return spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_customers
        FROM customer_v JOIN nation_v ON c_nationkey = n_nationkey
        WHERE EXISTS (SELECT 1 FROM orders_v
                      WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        GROUP BY n_name
        """
    )


@register(
    "q_not_exists_subquery",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 350000)
    GROUP BY c_mktsegment
    """,
    doc="Correlated NOT EXISTS — decorrelates to a left-anti join "
        "(customers with no 350k+ order, per segment). NOT EXISTS rather "
        "than NOT IN: identical here, but safe under nullable keys.",
)
def q_not_exists_subquery(spark, sf_dir):
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer_v
        WHERE NOT EXISTS (SELECT 1 FROM orders_v
                          WHERE o_custkey = c_custkey AND o_totalprice > 350000)
        GROUP BY c_mktsegment
        """
    )


@register(
    "q_scalar_subquery",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(22,2)) * (SELECT COUNT(*) FROM orders)
          > (SELECT SUM(CAST(o_totalprice AS DECIMAL(22,2))) FROM orders)
    GROUP BY o_orderpriority
    """,
    doc="Scalar subqueries (broadcast one-row joins): orders above the "
        "global mean price, per priority. The mean comparison is "
        "cross-multiplied into exact decimal arithmetic — price * N > "
        "total — because AVG on doubles rounds engine-dependently at "
        "the boundary.",
)
def q_scalar_subquery(spark, sf_dir):
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders_v
        WHERE CAST(o_totalprice AS DECIMAL(22,2)) * (SELECT COUNT(*) FROM orders_v)
              > (SELECT SUM(CAST(o_totalprice AS DECIMAL(22,2))) FROM orders_v)
        GROUP BY o_orderpriority
        """
    )


@register(
    "q_in_subquery",
    """
    SELECT l_returnflag, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(22,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4')
    GROUP BY l_returnflag
    """,
    doc="Uncorrelated IN subquery — planned as a left-semi join against "
        "the filtered part keys (broadcast: the dim side is tiny).",
)
def q_in_subquery(spark, sf_dir):
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(22,2))) AS DOUBLE) AS sum_price
        FROM lineitem_v
        WHERE l_partkey IN (SELECT p_partkey FROM part_v WHERE p_brand = 'Brand#4')
        GROUP BY l_returnflag
        """
    )
