"""Static product catalog port (reference product_list.py, seed=894):
determinism, price-psychology invariants, and dim-vs-catalog
reconciliation through the order fixture."""

from __future__ import annotations

import math

from ecommerce_analytics_platform_spark.fixtures.catalog import (
    catalog_df,
    catalog_price_map,
    catalog_reconciliation,
    generate_catalog,
    round_price,
)
from ecommerce_analytics_platform_spark.fixtures.generator import generate_fixture


def test_round_price_psychology_bands():
    assert round_price(7.32) == 7.99
    assert round_price(9.999) == 9.99
    assert round_price(23.10) == 23.95
    assert round_price(49.99) == 49.95
    assert round_price(77.7) == 77.49
    assert round_price(149.99) == 149.49
    assert round_price(150.0) == 150.0
    assert round_price(287.6) == 288.0


def test_catalog_deterministic_and_invariant():
    cat = generate_catalog()
    assert len(cat) == 1500
    assert cat == generate_catalog()  # seeded determinism
    assert cat[0]["product_id"] == "SKU-00001"
    assert cat[-1]["product_id"] == "SKU-01500"
    for p in cat:
        cents = round(p["price_usd"] % 1, 2)
        if p["price_usd"] < 10:
            assert cents == 0.99, p
        elif p["price_usd"] < 50:
            assert cents == 0.95, p
        elif p["price_usd"] < 150:
            assert cents == 0.49, p
        else:
            assert cents == 0.0, p
    # weighted bands: the cheap bands dominate (0.35/0.40/0.20/0.05)
    n_cheap = sum(1 for p in cat if p["price_usd"] < 50)
    assert n_cheap > 1500 * 0.6


def test_catalog_priced_fixture_reconciles(spark):
    """Orders generated WITH the catalog price every line item off the
    catalog → zero mismatches; the uniform-noise fixture does not."""
    catalog = catalog_price_map(num_products=40)  # fixture SKUs are 1..40
    _, orders = generate_fixture(seed=5, n_sessions=80, catalog=catalog)
    assert orders, "fixture produced no orders"
    rows = [
        (it["product_id"], it["quantity"], it["quantity"] * it["price"])
        for o in orders
        for it in o["items"]
    ]
    items = spark.createDataFrame(rows, "product_id string, quantity long, line_amount double")
    rec = catalog_reconciliation(items, catalog_df(spark, num_products=40))
    out = rec.collect()
    assert sum(r["n_items"] for r in out) == len(rows)
    assert all(r["n_mismatched"] == 0 for r in out)
    assert all(r["catalog_price"] is not None for r in out)

    # event stream must be identical with/without catalog (prices aside)
    ev_cat, _ = generate_fixture(seed=5, n_sessions=80, catalog=catalog)
    ev_noise, orders_noise = generate_fixture(seed=5, n_sessions=80)
    assert ev_cat == ev_noise
    rows_n = [
        (it["product_id"], it["quantity"], it["quantity"] * it["price"])
        for o in orders_noise
        for it in o["items"]
    ]
    items_n = spark.createDataFrame(rows_n, "product_id string, quantity long, line_amount double")
    mism = sum(r["n_mismatched"] for r in
               catalog_reconciliation(items_n, catalog_df(spark, num_products=40)).collect())
    assert mism > 0  # uniform-noise prices are off-catalog
