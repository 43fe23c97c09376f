"""Cluster packaging: run the engine unmodified off local mode.

The engine is a plain Python package with no compiled extensions, so the
cluster deployment unit is a ``--py-files`` zip + a driver script + a
properties file (``conf/spark-scale.conf``) — the standard spark-submit
layout (VERDICT r4 directive #8):

    spark-submit \
      --master yarn --deploy-mode cluster \
      --properties-file conf/spark-scale.conf \
      --py-files dist/ecommerce_analytics_platform_spark.zip \
      scripts/cluster_entry.py --sf-dir hdfs:///data/sf1000

``build_pyfiles_zip`` produces the zip (package sources only — tests,
fixtures-on-disk and caches excluded); ``build_submit_command`` assembles
the full argv. Neither shells out, so they are unit-testable in this
container (which has no cluster); ``scripts/cluster_entry.py`` is the
driver program and also runs fine under plain ``python`` in local mode.
"""

from __future__ import annotations

import os
import zipfile

_PKG = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_PKG)


def build_pyfiles_zip(out_path: str | None = None) -> str:
    """Zip the package for ``--py-files``. Import roots must sit at the
    zip root (``ecommerce_analytics_platform_spark/__init__.py``), which
    is exactly how executors' Python workers will unpack it."""
    out_path = out_path or os.path.join(_REPO, "dist", "ecommerce_analytics_platform_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(_PKG):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, _REPO)
                zf.write(full, rel)
    return out_path


def build_submit_command(
    app: str,
    master: str = "yarn",
    deploy_mode: str = "cluster",
    properties_file: str | None = None,
    py_files: str | None = None,
    extra_conf: dict[str, str] | None = None,
    app_args: tuple[str, ...] = (),
) -> list[str]:
    """Assemble the spark-submit argv for a driver script.

    ``properties_file`` defaults to ``conf/spark-scale.conf``;
    ``py_files`` defaults to a freshly built package zip. ``extra_conf``
    entries become ``--conf k=v`` AFTER the properties file (submit
    precedence: --conf overrides the file)."""
    properties_file = properties_file or os.path.join(_REPO, "conf", "spark-scale.conf")
    if not os.path.isfile(properties_file):
        raise FileNotFoundError(properties_file)
    py_files = py_files or build_pyfiles_zip()
    cmd = [
        "spark-submit",
        "--master", master,
        "--deploy-mode", deploy_mode,
        "--properties-file", properties_file,
        "--py-files", py_files,
    ]
    for k, v in (extra_conf or {}).items():
        cmd += ["--conf", f"{k}={v}"]
    cmd.append(app)
    cmd += list(app_args)
    return cmd


def load_properties(path: str) -> dict[str, str]:
    """Parse a spark-defaults-style properties file (whitespace-separated
    key/value, ``#`` comments)."""
    out: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            k, _, v = line.partition(" ")
            out[k.strip()] = v.strip()
    return out
