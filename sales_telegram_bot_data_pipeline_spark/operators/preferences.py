"""User/shop preference regrouping — reference op 48 in its literal form
(README.md:92-97: group users by included/excluded shops to target
notifications).

FIXTURES.md §B6 shape: users carry ``included_shops``/``excluded_shops``
arrays.  Membership is evaluated with array predicates
(``array_contains``), the exact declarative form of the reference's
preference model; the semi/anti-join queries cover the relational form.

Scale: the users table partitions by user_id; the shops side is tiny and
broadcast.  An exploded (user, shop) fan-out before a join would also work
but multiplies the shuffle by |included|; array predicates keep it 1 row
per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.prices import SHOPS
from ..registry import register
from ..sources.tables import load_table


def _users_sql_duckdb() -> str:
    shops = ", ".join(f"'{s}'" for s in SHOPS[:8])
    return f"""
WITH shop_list AS (SELECT [{shops}] AS all_shops),
users AS (
  SELECT c_custkey AS user_id,
         (SELECT all_shops FROM shop_list)[1 + c_custkey % 8] AS inc1,
         (SELECT all_shops FROM shop_list)[1 + (c_custkey // 3) % 8] AS inc2,
         (SELECT all_shops FROM shop_list)[1 + (c_custkey // 7) % 8] AS exc1
  FROM customer
)
SELECT user_id, shop
FROM (
  SELECT user_id, unnest([inc1, inc2]) AS shop, exc1 FROM users
) t
WHERE shop <> exc1
GROUP BY user_id, shop
ORDER BY user_id, shop
"""


@register(
    "user_shop_regrouping",
    oracle=_users_sql_duckdb(),
    doc="Reference op 48 (README regroup_by_shop) in array-preference form: "
    "users with included/excluded shop arrays → (user, shop) notification "
    "targets via array membership, exclusions honored.",
    tags=("preferences", "array"),
)
def user_shop_regrouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    shop_arr = F.array(*[F.lit(s) for s in SHOPS[:8]])
    users = cust.select(
        F.col("c_custkey").alias("user_id"),
        F.array(
            F.element_at(shop_arr, (F.col("c_custkey") % 8).cast("int") + 1),
            F.element_at(shop_arr, (F.expr("c_custkey div 3") % 8).cast("int") + 1),
        ).alias("included_shops"),
        F.array(
            F.element_at(shop_arr, (F.expr("c_custkey div 7") % 8).cast("int") + 1)
        ).alias("excluded_shops"),
    )
    exploded = users.select(
        "user_id", F.explode("included_shops").alias("shop"), "excluded_shops"
    )
    return (
        exploded.where(~F.expr("array_contains(excluded_shops, shop)"))
        .select("user_id", "shop")
        .distinct()
        .orderBy("user_id", "shop")
    )
