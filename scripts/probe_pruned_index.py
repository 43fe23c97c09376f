"""Probe (VERDICT r7 directive #3 'done' bar): per-micro-batch wall time
must track BATCH size, not INDEX size, now that every per-batch index
read is manifest-pruned to the batch's own bucket_part partitions.

Method: pre-populate the near-dup LSH index at two corpus sizes (N and
64N docs, committed through the real append path so the partition layout
is the production one), then time the SAME fixed 50-doc batch against
each. Report the ratio — a full-index scan would grow ~64x in scan bytes
(and measurably in wall); the pruned read should hold the wall within
small-constant territory. Also reports the file-list sizes actually
read, which is the mechanism being probed.

Usage: python scripts/probe_pruned_index.py [N_small]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from ecommerce_analytics_platform_spark.session import get_spark
from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable
from ecommerce_analytics_platform_spark.streaming.neardup import (
    _N_BUCKET_PARTS,
    _batch_parts,
    _read_index,
    process_neardup_batch,
)
from ecommerce_analytics_platform_spark.operators.dedup import lsh_band_buckets


def _docs(spark, n, seed_words=37, start=0):
    # distinct-ish docs: each doc gets its own vocabulary slice so the
    # index spreads over many buckets (the realistic shape — boilerplate
    # skew is the max_bucket probe's job, not this one's)
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}_"), (F.col("id") * (j + 1) % 9973).cast("string"))
                for j in range(seed_words)
            ],
        ).alias("text"),
    )


def build_index(spark, root, n_docs, batch_rows=100_000):
    dec = ManifestTable(spark, f"{root}/dec")
    idx = ManifestTable(spark, f"{root}/idx")
    done = 0
    b = 0
    while done < n_docs:
        take = min(batch_rows, n_docs - done)
        process_neardup_batch(_docs(spark, take, start=done), b, dec, idx)
        done += take
        b += 1
    return dec, idx


def time_fixed_batch(spark, dec, idx, bid, batch_n=50, reps=3):
    walls = []
    for r in range(reps):
        batch = _docs(spark, batch_n, start=10_000_000 + bid * 1000 + r * batch_n)
        t0 = time.time()
        process_neardup_batch(batch, bid * 100 + r + 50, dec, idx)
        walls.append(time.time() - t0)
    return min(walls)


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000
    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("probe_pruned_index")
    import tempfile

    root = tempfile.mkdtemp(prefix="probe_idx_")
    dec_s, idx_s = build_index(spark, f"{root}/small", n_small)
    w_small = time_fixed_batch(spark, dec_s, idx_s, 1, batch_n=batch_n)

    dec_l, idx_l = build_index(spark, f"{root}/large", n_small * 64)
    w_large = time_fixed_batch(spark, dec_l, idx_l, 2, batch_n=batch_n)

    # mechanism check: files listed by a pruned read of the large index
    probe = _docs(spark, batch_n, start=99_000_000)
    nb = lsh_band_buckets(probe, "doc_id", "text")
    parts = _batch_parts(nb, _N_BUCKET_PARTS)
    pruned_files = len(_read_index(idx_l, parts).inputFiles())
    all_files = len(idx_l.read().inputFiles())

    import json

    print(
        json.dumps(
            {
                "n_small": n_small,
                "batch_n": batch_n,
                "n_large": n_small * 64,
                "batch_wall_small_s": round(w_small, 3),
                "batch_wall_large_s": round(w_large, 3),
                "wall_ratio_64x_index": round(w_large / w_small, 2),
                "pruned_files": pruned_files,
                "all_files": all_files,
                "file_fraction": round(pruned_files / max(all_files, 1), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
