"""Model metadata: exposures + docs — the reference's dbt metadata layer.

Ports the surface a dbt user gets from ``exposures.yml`` + schema.yml
descriptions (reference dbt_project/models/marts/metrics/exposures.yml:1-76
and dbt_project/models/schema.yml) without dbt: who consumes each gold
table, what every model is for, and lineage queries over the same
:data:`~ecommerce_analytics_platform_spark.plans.runner.MODELS` DAG the
runner executes — so "what feeds the KPI dashboard" and "what breaks if I
change stg_clickstream_events" are answerable programmatically (dbt's
``dbt ls --select +exposure:...`` / ``model+``).

Pure metadata + graph walks — no Spark session required.
"""

from __future__ import annotations

from dataclasses import dataclass

from ecommerce_analytics_platform_spark.plans.runner import MODELS


@dataclass(frozen=True)
class Exposure:
    """A downstream consumer of gold tables — reference exposures.yml
    entry (name/type/depends_on/owner/maturity)."""

    name: str
    type: str
    depends_on: tuple[str, ...]
    description: str
    owner: str
    maturity: str


# Reference exposures.yml:1-76 — the four dashboards, deps mapped to this
# engine's "schema.table" naming (ref('metrics_daily_kpis') →
# marts.metrics_daily_kpis).
EXPOSURES: list[Exposure] = [
    Exposure(
        "kpi_dashboard", "dashboard", ("marts.metrics_daily_kpis",),
        "Daily KPI dashboard for executives: active users, sessions, "
        "orders, revenue, conversion rates.",
        "Data Analytics Team", "high",
    ),
    Exposure(
        "funnel_dashboard", "dashboard", ("marts.metrics_daily_funnel",),
        "Funnel dashboard: product views, add-to-cart, checkout, orders.",
        "Growth Analytics Team", "medium",
    ),
    Exposure(
        "user_lifecycle_dashboard", "dashboard",
        ("marts.metrics_user_lifecycle",),
        "User lifecycle dashboard: acquisition, first purchase, repeat "
        "purchase, lifetime value per user cohort.",
        "CRM / Retention Analytics", "medium",
    ),
    Exposure(
        "product_performance_dashboard", "dashboard",
        ("marts.metrics_product_performance_daily",),
        "Daily product performance dashboard: units sold, orders "
        "containing product, revenue per product, product conversion.",
        "Merchandising Team", "medium",
    ),
]

# schema.yml model descriptions (reference models/schema.yml) — the docs
# half of the metadata layer. Source tables included so docs cover the
# whole lineage graph, not just runner-built models.
MODEL_DESCRIPTIONS: dict[str, str] = {
    "bronze.clickstream": "Raw clickstream events from streaming ingest.",
    "bronze.orders": "Raw orders from streaming ingest.",
    "staging.stg_clickstream_events":
        "Silver-level cleaned clickstream events, deduplicated and normalized.",
    "staging.stg_clickstream_sessions":
        "Aggregated session-level data derived from clickstream events.",
    "staging.stg_orders":
        "Cleaned, deduplicated orders with item_count and order totals.",
    "staging.stg_order_items": "One row per (order, product) line item.",
    "marts.fact_events": "Event grain fact over cleaned clickstream.",
    "marts.fact_sessions": "Session fact with order rollup columns.",
    "marts.fact_orders": "Order grain fact.",
    "marts.fact_order_items": "Order-item grain fact.",
    "marts.dim_date": "Calendar dimension spanning observed event dates.",
    "marts.dim_users": "User dimension: first/last seen, order lifetime.",
    "marts.dim_products": "Product dimension derived from sold items.",
    "marts.dim_session_context": "First-event-of-session attributes.",
    "marts.metrics_daily_kpis": "Daily KPIs: users, sessions, orders, revenue.",
    "marts.metrics_daily_funnel": "Daily funnel stage counts and rates.",
    "marts.metrics_user_lifecycle": "Per-user lifecycle metrics.",
    "marts.metrics_product_performance_daily":
        "Daily per-product sales and conversion.",
}


def lineage() -> dict[str, list[str]]:
    """model → direct upstream deps, from the SAME specs the runner
    executes (never a second hand-maintained graph)."""
    return {s.name: list(s.deps) for s in MODELS}


def upstream(name: str) -> set[str]:
    """Transitive closure of ``name``'s dependencies (dbt ``+model``)."""
    graph = lineage()
    out: set[str] = set()
    stack = list(graph.get(name, []))
    while stack:
        n = stack.pop()
        if n not in out:
            out.add(n)
            stack.extend(graph.get(n, []))
    return out


def downstream(name: str) -> set[str]:
    """Models that (transitively) depend on ``name`` (dbt ``model+``)."""
    graph = lineage()
    out: set[str] = set()
    changed = True
    while changed:
        changed = False
        for m, deps in graph.items():
            if m not in out and (name in deps or out & set(deps)):
                out.add(m)
                changed = True
    return out


def exposures_for(name: str) -> list[Exposure]:
    """Which exposures break if ``name`` changes — the "what feeds the
    dashboard" query (dbt ``model+ --resource-type exposure``)."""
    affected = downstream(name) | {name}
    return [e for e in EXPOSURES if affected & set(e.depends_on)]


def generate_docs() -> str:
    """Markdown catalog of the DAG: every model with its description,
    direct deps, and consuming exposures — ``dbt docs generate``'s
    human-readable core without the webserver."""
    lines = ["# Model catalog", ""]
    for spec in MODELS:
        exps = exposures_for(spec.name)
        lines.append(f"## {spec.name}")
        lines.append(MODEL_DESCRIPTIONS.get(spec.name, "(no description)"))
        lines.append(f"- materialized: {spec.materialized}")
        if spec.unique_key:
            lines.append(f"- unique_key: {', '.join(spec.unique_key)}")
        lines.append(
            "- depends on: " + (", ".join(spec.deps) if spec.deps else "(sources)")
        )
        if exps:
            lines.append(
                "- feeds exposures: " + ", ".join(e.name for e in exps)
            )
        lines.append("")
    lines.append("# Exposures")
    lines.append("")
    for e in EXPOSURES:
        lines.append(f"## {e.name}")
        lines.append(e.description)
        lines.append(f"- type: {e.type}; owner: {e.owner}; maturity: {e.maturity}")
        lines.append(f"- depends on: {', '.join(e.depends_on)}")
        lines.append("")
    return "\n".join(lines)
