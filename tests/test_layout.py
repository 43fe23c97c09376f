"""Write-side layout: partition pruning + range clustering observable at scan."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from ecommerce_analytics_platform_spark.plans.testdata_queries import _t
from ecommerce_analytics_platform_spark.sources.layout import scan_stats, write_clustered
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def layout_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("layout") / "events")
    ev = _t(spark, SF_DIR, "events")
    write_clustered(
        ev, path, partition_by=["event_type"], cluster_by=["ts"], num_files=8
    )
    return path


def test_partition_pruning_reads_one_directory(spark, layout_path):
    full = scan_stats(spark, layout_path)
    pruned = scan_stats(spark, layout_path, "event_type = 'click'")
    click_files = glob.glob(f"{layout_path}/event_type=click/*.parquet")
    assert pruned["numFiles"] == len(click_files)
    assert pruned["numFiles"] < full["numFiles"]
    exact = _t(spark, SF_DIR, "events").filter("event_type = 'click'").count()
    assert pruned["numOutputRows"] == exact


def test_range_clustering_gives_disjoint_file_ranges(layout_path):
    """Files within one partition directory cover non-overlapping ts ranges
    (repartitionByRange + sort), so min/max footer stats can skip files."""
    files = sorted(glob.glob(f"{layout_path}/event_type=click/*.parquet"))
    assert len(files) >= 2, "expected multiple range buckets per partition"
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns) if md.row_group(0).column(i).path_in_schema == "ts"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, f"overlapping ts ranges between clustered files: {ranges}"


def test_rowgroup_pruning_skips_rows(spark, layout_path):
    """A selective ts predicate on the clustered layout reads fewer rows
    than the table holds (parquet row-group/page skip via min/max stats)."""
    full = scan_stats(spark, layout_path)
    sel = scan_stats(
        spark, layout_path, "ts >= timestamp'2024-01-30' AND event_type = 'click'"
    )
    assert sel["numOutputRows"] < full["numOutputRows"]


def test_zorder_key_matches_python_morton(spark):
    """zorder_key bit placement == reference Morton interleave."""
    from ecommerce_analytics_platform_spark.sources.layout import zorder_key

    def morton(vals, bits):
        z = 0
        for i in range(bits):
            for j, v in enumerate(vals):
                z |= ((v >> i) & 1) << (i * len(vals) + j)
        return z

    rows = [(a, b, c) for a in (0, 1, 5, 255) for b in (0, 3, 128) for c in (0, 7)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = df.select("a", "b", "c", zorder_key(["a", "b", "c"], bits=8).alias("z")).collect()
    for r in got:
        assert r.z == morton((r.a, r.b, r.c), 8), (r.a, r.b, r.c)


@pytest.fixture(scope="module")
def grid_paths(spark, tmp_path_factory):
    """64x64 grid written two ways: 1-D range-clustered by `a`, and
    Z-ordered by (a, b). 16 files each."""
    from ecommerce_analytics_platform_spark.sources.layout import write_zordered

    base = tmp_path_factory.mktemp("zorder")
    df = spark.createDataFrame(
        [(a, b, a * 64 + b) for a in range(64) for b in range(64)],
        "a long, b long, payload long",
    )
    rng = str(base / "range_a")
    zord = str(base / "zorder_ab")
    write_clustered(df, rng, cluster_by=["a"], num_files=16)
    write_zordered(df, zord, zorder_by=["a", "b"], num_files=16, bits=6)
    return rng, zord


def test_zorder_prunes_non_leading_column(spark, grid_paths):
    """A predicate on `b` alone: the 1-D layout clustered by `a` cannot
    skip anything (every file spans all of b), while the Z-ordered layout
    decodes a fraction of the table."""
    rng, zord = grid_paths
    pred = "b BETWEEN 0 AND 15"
    r = scan_stats(spark, rng, pred)["numOutputRows"]
    z = scan_stats(spark, zord, pred)["numOutputRows"]
    total = 64 * 64
    assert z < total, "Z-order layout should row-group-skip on b"
    assert z <= r, f"Z-order ({z}) should decode no more than range layout ({r})"


def test_zorder_box_predicate_beats_range_layout(spark, grid_paths):
    """A 2-D box predicate: Z-order confines the box to few files; the
    1-D layout prunes only on `a`."""
    rng, zord = grid_paths
    pred = "a BETWEEN 0 AND 15 AND b BETWEEN 0 AND 15"
    exact = 16 * 16
    r = scan_stats(spark, rng, pred)
    z = scan_stats(spark, zord, pred)
    assert z["numOutputRows"] >= exact  # decoded superset contains the box
    assert z["numOutputRows"] <= r["numOutputRows"]
    assert z["numOutputRows"] < 64 * 64
