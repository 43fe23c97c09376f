"""Range (interval) join, time-bucketed.

Not in the reference (equi-joins only — SURVEY §2.4). A naive Spark range
join (``l.ts BETWEEN r.lo AND r.hi`` with an equality on the key) is fine —
Catalyst plans SMJ on the key and filters — but WITHOUT a selective equi-key
it degenerates to BroadcastNestedLoopJoin (quadratic). The scalable shape
used here is the standard time-bucketing rewrite:

1. pick a bucket width ≥ typical interval length,
2. explode each right-side interval into the buckets it overlaps,
3. equi-join on (key, bucket) — a plain shuffled hash join,
4. re-apply the exact range predicate.

Each row joins only rows in overlapping buckets, so the join stays linear
in candidates; the bucket width trades replication factor (intervals span
``len/width + 1`` buckets) against candidate precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_lo: str,
    right_hi: str,
    bucket_seconds: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to right intervals: same ``key`` and
    ``right_lo <= left_ts <= right_hi`` — via (key, time-bucket) equi-join.

    ``how='left'`` keeps unmatched left rows (right columns null).
    Output: all left columns + all right columns (callers project).
    """
    lb = F.floor(F.col(left_ts).cast("double") / bucket_seconds).cast("long")
    tagged_l = left.withColumn("__bucket", lb)

    lo_b = F.floor(F.col(right_lo).cast("double") / bucket_seconds).cast("long")
    hi_b = F.floor(F.col(right_hi).cast("double") / bucket_seconds).cast("long")
    tagged_r = right.withColumn("__bucket", F.explode(F.sequence(lo_b, hi_b)))

    cond = (
        (tagged_l[key] == tagged_r[key])
        & (tagged_l["__bucket"] == tagged_r["__bucket"])
        & (tagged_l[left_ts] >= tagged_r[right_lo])
        & (tagged_l[left_ts] <= tagged_r[right_hi])
    )
    joined = tagged_l.join(tagged_r, cond, how)
    drop = [tagged_r[key], tagged_l["__bucket"], tagged_r["__bucket"]]
    out = joined
    for c in drop:
        out = out.drop(c)
    return out
