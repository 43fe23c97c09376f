"""Python UDTF surface (Spark 4 table functions).

The reference has no UDFs at all (SURVEY §2.9) — its per-row logic lives in
SQL. This engine's Python escape hatches are, in preference order:

1. built-in ``pyspark.sql.functions`` (JVM, whole-stage codegen),
2. Arrow-batched ``mapInPandas`` / ``applyInPandas`` (vectorized),
3. **Python UDTF** (this module) — when one input row must become a
   *variable number* of output rows with per-row Python logic and the
   caller wants SQL ``LATERAL`` composability rather than a DataFrame
   transform.

UDTFs are the slow path (row-at-a-time pickling unless Arrow-enabled); the
production chunker is the pure-column ``doc_chunks`` registry query — this
exists to cover the operator class and to document the trade-off. At 100 TB
a UDTF's ``eval`` runs partition-local with no shuffle, so it scales
embarrassingly; the constant factor is what's bad, not the shape.
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="chunk_idx int, n_tokens int, chunk string")
class ChunkDocUDTF:
    """Split one document's text into fixed-size token windows with stride.

    One input row → ceil((n_tokens - size) / stride) + 1 output rows; the
    same concat-and-chunk shape as the ``doc_chunks`` registry query
    (50-token windows, stride 40) so the two are cross-checkable.
    """

    def eval(self, text: str, size: int, stride: int):  # noqa: A002
        if text is None:
            return
        toks = text.split()
        if not toks:
            return
        # one window per stride start while it still covers >= 1 token —
        # identical chunk boundaries to the columnar doc_chunks query
        # (sequence(0, floor((n_tok-1)/stride)) slices)
        idx = 0
        start = 0
        while start < len(toks):
            window = toks[start : start + size]
            yield idx, len(window), " ".join(window)
            start += stride
            idx += 1


def register_udtfs(spark) -> None:
    """Register the UDTF surface for SQL ``LATERAL`` use:

    ``SELECT doc_id, c.* FROM docs, LATERAL chunk_doc(text, 50, 40) c``
    """
    spark.udtf.register("chunk_doc", ChunkDocUDTF)


__all__ = ["ChunkDocUDTF", "register_udtfs", "lit"]
