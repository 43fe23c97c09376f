"""Static product catalog — behavioral port of the reference's seeded
catalog producer (reference producers/product_list.py:1-39).

Semantics preserved exactly:

- price bands ((5,20),(20,60),(60,150),(150,400)) drawn with weights
  (0.35, 0.40, 0.20, 0.05) via seeded ``random.choices`` then
  ``random.uniform`` within the band (product_list.py:16-31);
- price-psychology rounding (product_list.py:5-13): <10 → int+.99,
  <50 → int+.95, <150 → int+.49, else whole dollars;
- ``SKU-%05d`` ids from 1, default 1500 products, seed 894
  (product_list.py:18-36).

The reference never loads products.json into its warehouse
(dim_products.sql derives from sold items — SURVEY §1.2), so here the
catalog serves the same two roles it plays there: pricing source for the
order producer (linked_clickstream_order_generator.py:97,239-241) and a
reconciliation surface for the sold-items dimension.
"""

from __future__ import annotations

import random


def round_price(price: float) -> float:
    """Price-psychology rounding (reference product_list.py:5-13)."""
    if price < 10:
        return round(int(price) + 0.99, 2)
    if price < 50:
        return round(int(price) + 0.95, 2)
    if price < 150:
        return round(int(price) + 0.49, 2)
    return round(round(price), 2)


def generate_catalog(
    num_products: int = 1500,
    price_ranges: tuple = ((5, 20), (20, 60), (60, 150), (150, 400)),
    weights: tuple = (0.35, 0.40, 0.20, 0.05),
    seed: int = 894,
) -> list[dict]:
    """[{"product_id": "SKU-00001", "price_usd": 7.99}, ...] — deterministic
    for a given seed (reference product_list.py:15-39)."""
    rng = random.Random(seed)
    products = []
    for i in range(1, num_products + 1):
        low, high = rng.choices(price_ranges, weights=weights)[0]
        # float(): whole-dollar round_price returns a Python int (faithful
        # to the reference's json), but a typed engine wants one type
        products.append(
            {"product_id": f"SKU-{i:05d}", "price_usd": float(round_price(rng.uniform(low, high)))}
        )
    return products


def catalog_df(spark, **kwargs):
    """The catalog as a (small, broadcastable) DataFrame — the dimension
    side of any catalog join at scale."""
    from ecommerce_analytics_platform_spark.session import literal_df

    return literal_df(
        spark,
        [(p["product_id"], p["price_usd"]) for p in generate_catalog(**kwargs)],
        "product_id string, price_usd double",
    )


def catalog_price_map(**kwargs) -> dict[str, float]:
    return {p["product_id"]: p["price_usd"] for p in generate_catalog(**kwargs)}


def catalog_reconciliation(order_items, catalog, price_expr="line_amount / quantity"):
    """Sold-items vs catalog price reconciliation: per product, how many
    sold line items priced off-catalog. The catalog side is broadcast
    (1500 rows); the items side keeps its existing partitioning — one
    map-side join, no extra shuffle at any scale.

    Returns (product_id, catalog_price, n_items, n_mismatched)."""
    from pyspark.sql import functions as F

    items = order_items.filter(F.col("product_id").isNotNull()).withColumn(
        "__unit_price", F.round(F.expr(price_expr), 2)
    )
    return (
        items.join(F.broadcast(catalog), "product_id", "left")
        .groupBy("product_id", "price_usd")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.when(
                    F.col("price_usd").isNull()
                    | (F.abs(F.col("__unit_price") - F.col("price_usd")) > 0.005),
                    1,
                ).otherwise(0)
            ).alias("n_mismatched"),
        )
        .select(
            "product_id",
            F.col("price_usd").alias("catalog_price"),
            "n_items",
            "n_mismatched",
        )
    )
