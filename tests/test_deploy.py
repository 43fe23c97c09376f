"""Cluster packaging profile (VERDICT r4 directive #8): py-files zip,
submit command assembly, properties file sanity, and the driver script in
local mode."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

from ecommerce_analytics_platform_spark.deploy import (
    build_pyfiles_zip,
    build_submit_command,
    load_properties,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_layout(tmp_path):
    """Import roots must sit at the zip root, tests/caches excluded."""
    out = build_pyfiles_zip(str(tmp_path / "pkg.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert "ecommerce_analytics_platform_spark/__init__.py" in names
    assert "ecommerce_analytics_platform_spark/plans/testdata_queries.py" in names
    assert "ecommerce_analytics_platform_spark/sources/manifest.py" in names
    assert all(n.endswith(".py") for n in names)
    assert not any("__pycache__" in n or n.startswith("tests/") for n in names)


def test_zip_is_importable_from_sys_path(tmp_path):
    """The executor-side contract: the zip itself on sys.path imports."""
    out = build_pyfiles_zip(str(tmp_path / "pkg.zip"))
    code = (
        f"import sys; sys.path.insert(0, {out!r}); "
        "import ecommerce_analytics_platform_spark.operators.dedup as d; "
        "print(d.__name__)"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "operators.dedup" in r.stdout


def test_submit_command_shape(tmp_path):
    cmd = build_submit_command(
        app="scripts/cluster_entry.py",
        py_files=str(tmp_path / "pkg.zip") if build_pyfiles_zip(str(tmp_path / "pkg.zip")) else None,
        extra_conf={"spark.executor.instances": "200"},
        app_args=("--sf-dir", "hdfs:///data/sf1000", "--query", "daily_kpis"),
    )
    assert cmd[0] == "spark-submit"
    assert cmd[cmd.index("--master") + 1] == "yarn"
    props = cmd[cmd.index("--properties-file") + 1]
    assert os.path.isfile(props)
    assert cmd[cmd.index("--py-files") + 1].endswith(".zip")
    i = cmd.index("--conf")
    assert cmd[i + 1] == "spark.executor.instances=200"
    assert cmd[-4:] == ["--sf-dir", "hdfs:///data/sf1000", "--query", "daily_kpis"]
    # --conf comes after --properties-file so it takes precedence
    assert cmd.index("--properties-file") < i < cmd.index("scripts/cluster_entry.py")


def test_scale_conf_required_keys():
    """The externalized conf must carry every semantic key the in-code
    session factory pins (bit-parity with local runs) plus cluster sizing."""
    props = load_properties(os.path.join(REPO, "conf", "spark-scale.conf"))
    assert props["spark.sql.session.timeZone"] == "UTC"
    assert props["spark.sql.parquet.outputTimestampType"] == "TIMESTAMP_MICROS"
    assert props["spark.sql.sources.partitionOverwriteMode"] == "dynamic"
    assert props["spark.sql.adaptive.enabled"] == "true"
    assert props["spark.sql.adaptive.skewJoin.enabled"] == "true"
    assert props["spark.sql.execution.arrow.pyspark.enabled"] == "true"
    assert int(props["spark.sql.shuffle.partitions"]) >= 1000
    assert props["spark.dynamicAllocation.enabled"] == "true"


def test_cluster_entry_runs_local():
    """The submit driver program works as a plain script (local mode) —
    proves the entry's imports/arg plumbing without a cluster."""
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "cluster_entry.py"),
            "--sf-dir", "/root/testdata/sf0.001",
            "--query", "revenue_by_region", "--local",
        ],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "revenue_by_region: 25 rows" in r.stdout
