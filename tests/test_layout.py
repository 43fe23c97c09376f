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
