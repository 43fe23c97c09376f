"""Deterministic adversarial fixture generator.

Behavioral port of the reference's synthetic producer
(producers/linked_clickstream_order_generator.py) at test scale: the same
*adversarial properties* the reference uses as implicit property testing
(SURVEY §5.3), seeded for determinism:

- funnel state machine per session: page_view → view_product → add_to_cart
  → checkout_start → purchase (generator lines 171-264, EVENT_TYPES line 49)
- schema versions: ~30% of sessions are v2 with user_agent/referrer/
  experiment_id (lines 162-167,180)
- late events: ~15% shifted earlier than ingest time (lines 82-83,131-139)
- duplicate injection: a fraction of events/orders re-emitted (lines 366-371)
- cancelled orders: ~3% (lines 279-282)
- linked orders: order.session_id/user_id match a converting session
  (lines 266-292); items is a nested array of {product_id, quantity, price}

Output: plain lists of dicts for :func:`write_ndjson_fixture` — raw-layer
NDJSON, exactly what the ingest jobs consume.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

EVENT_TYPES = ["page_view", "view_product", "add_to_cart", "checkout_start", "purchase"]
DEVICES = ["mobile", "desktop", "tablet"]
COUNTRIES = ["us", "gb", "de", "fr", "jp"]
REFERRERS = ["google", "direct", "email", "social"]
EXPERIMENTS = [None, "checkout_redesign", "pricing_test"]


def generate_fixture(
    seed: int = 42,
    n_sessions: int = 60,
    start: datetime = datetime(2026, 1, 10, 8, 0, 0),
    dup_rate: float = 0.08,
    late_rate: float = 0.15,
    cancel_rate: float = 0.05,
    bad_ts_rate: float = 0.02,
    catalog: dict[str, float] | None = None,
) -> tuple[list[dict], list[dict]]:
    """Returns (clickstream_events, orders) as raw NDJSON-ready dicts.

    ``catalog`` (product_id → price, see fixtures/catalog.py): when given,
    cart item prices come from the static catalog — the reference's
    producer behavior (linked_clickstream_order_generator.py:97,239) —
    instead of per-item uniform noise; enables dim_products-vs-catalog
    reconciliation. One rng.uniform draw still happens either way so the
    event stream is identical with or without a catalog."""
    rng = random.Random(seed)
    events: list[dict] = []
    orders: list[dict] = []

    for si in range(n_sessions):
        session_id = f"S{seed}-{si:04d}"
        user_id = f"U{rng.randint(1, max(n_sessions // 3, 1)):04d}"
        v2 = rng.random() < 0.30
        t = start + timedelta(minutes=rng.randint(0, 60 * 48), seconds=rng.randint(0, 59))
        device = rng.choice(DEVICES)
        country = rng.choice(COUNTRIES)
        referrer = rng.choice(REFERRERS) if v2 else None

        # funnel walk with decreasing continue-probability (behavioral analog
        # of the reference's FUNNEL_PROBS tables, lines 68-79)
        stages = 1 + min(
            4, int(rng.random() * 6)
        )  # 1..5 stages; later stages rarer
        cart: list[dict] = []
        for stage in range(stages):
            etype = EVENT_TYPES[stage]
            product_id = f"SKU-{rng.randint(1, 40):05d}" if stage >= 1 else None
            t = t + timedelta(seconds=rng.randint(5, 240))
            event_time = t
            if rng.random() < late_rate:  # late: occurred earlier than ingested
                event_time = t - timedelta(minutes=rng.randint(1, 10))
            ev = {
                "event_id": f"E{seed}-{si:04d}-{stage}",
                "event_type": etype,
                "user_id": user_id,
                "session_id": session_id,
                "product_id": product_id,
                "event_time": (
                    "not-a-timestamp"
                    if rng.random() < bad_ts_rate
                    else event_time.isoformat(sep=" ")
                ),
                "ingest_time": t.isoformat(sep=" "),
                "version": "v2" if v2 else "v1",
                "device": device,
                "country": country,
            }
            if v2:
                ev["user_agent"] = f"agent/{rng.randint(1, 9)}"
                ev["referrer"] = referrer
                ev["experiment_id"] = rng.choice(EXPERIMENTS)
            events.append(ev)
            if etype == "add_to_cart":
                # rng call ORDER is load-bearing: quantity then price, same
                # as the original dict-literal evaluation — reordering
                # would shift the whole downstream stream for every seed
                quantity = rng.randint(1, 3)
                noise_price = round(rng.uniform(5, 200), 2)
                cart.append(
                    {
                        "product_id": product_id,
                        "quantity": quantity,
                        "price": (
                            catalog.get(product_id, noise_price)
                            if catalog is not None
                            else noise_price
                        ),
                    }
                )
            if etype == "purchase" and cart:
                order_t = t + timedelta(seconds=rng.randint(10, 900))
                orders.append(
                    {
                        "order_id": f"O{seed}-{si:04d}",
                        "session_id": session_id,
                        "user_id": user_id,
                        "order_status": (
                            "cancelled" if rng.random() < cancel_rate else "completed"
                        ),
                        "items": cart,
                        "order_time": order_t.isoformat(sep=" "),
                        "ingest_time": (order_t + timedelta(seconds=rng.randint(0, 60))).isoformat(sep=" "),
                    }
                )

    # duplicate injection (reference lines 366-371): re-append random rows
    for _ in range(int(len(events) * dup_rate)):
        events.append(dict(rng.choice(events)))
    if orders:  # a tiny fixture can legitimately convert zero sessions
        for _ in range(max(1, int(len(orders) * dup_rate / 2))):
            orders.append(dict(rng.choice(orders)))

    return events, orders
