"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed via Arrow-batched ``mapInPandas``.

Beyond the reference surface (it is text/JSON only) — this is the
training-data-pipeline extension: a 100 TB multimodal corpus stores media
as binary columns (or object-store URIs) beside typed metadata, and every
transform is a vectorized batch function over Arrow record batches, never
a row-at-a-time Python UDF.

Decode kernels come in two tiers:

- **real** — formats parsed with pure numpy + stdlib
  (functions/codecs.py): PPM (P6) and 24-bit BMP images, **PNG** (8-bit
  gray/GA/RGB/RGBA, all 5 scanline filters — zlib DEFLATE is the
  stdlib's, so this compressed format needs no external dep), **animated
  GIF** (real LZW, global/local palettes, sub-rect compositing,
  transparency, disposal, interlace — the real multi-frame format behind
  ``sample_video_frames(kernel="real")``), PCM16 WAV audio, plus
  nearest-neighbor resize — and **baseline JPEG** (functions/jpeg.py:
  real DCT/Huffman sequential codec, 4:4:4 + 4:2:0, grayscale, restart
  markers; progressive/12-bit rejected with clear errors).
  ``kernel="real"`` on the operators below runs these against actual
  media bytes (tested on encoded fixtures with exact expected features;
  PNG unfilter and GIF compositing verified against hand-built spec
  vectors independent of the encoders).
- **stub/fake** — MP3/H.264-class formats need ffmpeg/torchvision,
  absent in this container; those kernel bodies are deterministic fakes /
  NotImplementedError stubs — clearly marked.

Everything Spark-side is real and tested either way: schemas, the
mapInPandas batch contract, partition sizing, metadata pushdown.

Scale notes: media bytes dominate I/O — keep them OUT of shuffles (derive
features, drop the blob before any join/groupBy); filter on metadata first
(pushed to parquet); ``spark.sql.files.maxPartitionBytes`` sizes partitions
so a batch of blobs fits executor memory; for >~100 MB media, store URIs
and stream from object storage inside the kernel instead.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pandas stays a lazy (executor-side) dependency
    import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata beside the opaque blob — the storage contract.
IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),     # opaque encoded bytes
        StructField("format", StringType()),      # 'jpeg' | 'png' | ...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("format", StringType()),      # 'wav' | 'mp3' | ...
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap JVM-side metadata columns for a binary media column —
    byte length + 60-bit content fingerprint (dedup key). No Python."""
    from ecommerce_analytics_platform_spark.functions.compat import portable_hash60

    return df.withColumn("n_bytes", F.length(content_col).cast("long")).withColumn(
        "content_fingerprint", portable_hash60(F.sha2(F.col(content_col), 256))
    )


def _fake_decode_image(buf: bytes) -> tuple[int, int, float]:
    """STUB decode kernel: deterministic fake (no Pillow in container).

    Real implementation: ``img = PIL.Image.open(io.BytesIO(buf))`` →
    (img.width, img.height, mean pixel). The fake derives stable pseudo
    dimensions/brightness from the bytes so plumbing tests are exact.
    """
    if not buf:
        return 0, 0, 0.0
    w = 64 + buf[0] % 192
    h = 64 + buf[-1] % 192
    mean = (sum(buf[:256]) / min(len(buf), 256)) / 255.0
    return w, h, round(mean, 6)


def _real_decode_image(buf: bytes) -> tuple[int | None, int | None, float | None]:
    """REAL decode kernel (PPM/BMP/PNG — pure numpy + stdlib zlib,
    functions/codecs.py). Returns (width, height, mean brightness in
    [0, 1] rounded 6dp); nulls for empty/undecodable bytes so a mixed
    corpus degrades row-wise instead of failing the batch."""
    from ecommerce_analytics_platform_spark.functions import codecs

    if not buf:
        return None, None, None
    try:
        arr = codecs.decode_image(buf)
    except Exception:  # corrupt media degrades row-wise, never batch-wise
        return None, None, None
    h, w = arr.shape[:2]
    return w, h, round(float(arr.mean()) / 255.0, 6)


def decode_image_features(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    kernel: str = "fake",
) -> DataFrame:
    """Image decode → features via Arrow-batched mapInPandas.

    Batch contract: each pandas batch holds whole rows of (id, bytes);
    output schema is fixed and blob-free (drop bytes before any shuffle).
    ``kernel="real"`` decodes PPM/BMP/PNG bytes with the pure-numpy
    codecs (exact, tested); ``"fake"`` is the deterministic stand-in for
    the remaining compressed formats (see :func:`_fake_decode_image`).
    """
    schema = "media_id long, width int, height int, mean_brightness double"
    decode = {"fake": lambda b: _fake_decode_image(b), "real": _real_decode_image}[kernel]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        for pdf in batches:
            decoded = [decode(b or b"") for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_brightness": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, content_col).mapInPandas(fn, schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "media_id",
    content_col: str = "content",
    kernel: str = "real",
) -> DataFrame:
    """Image resize via Arrow-batched mapInPandas.

    ``kernel="real"``: decode PPM/BMP with the pure-numpy codecs,
    nearest-neighbor resize (integer index maps — deterministic across
    platforms), re-encode as PPM; undecodable rows pass through with null
    content. ``kernel="stub"`` raises NotImplementedError from the
    executor (compressed formats need Pillow) — the returned DataFrame's
    schema/partitioning is still real for plan inspection.
    """
    schema = "media_id long, content binary, width int, height int"

    def stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "compressed-format resize requires Pillow; real kernel: "
            "PIL.Image.open(bytes).resize((target_w, target_h)).save(buf)"
        )
        yield  # pragma: no cover

    def real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        from ecommerce_analytics_platform_spark.functions import codecs

        for pdf in batches:
            out = {"media_id": [], "content": [], "width": [], "height": []}
            for mid, b in zip(pdf[id_col], pdf[content_col]):
                out["media_id"].append(mid)
                try:
                    arr = codecs.decode_image(b or b"")
                except ValueError:
                    out["content"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    continue
                resized = codecs.resize_nearest(arr, target_w, target_h)
                out["content"].append(codecs.encode_ppm(resized))
                out["width"].append(target_w)
                out["height"].append(target_h)
            yield pd.DataFrame(out)

    fn = {"stub": stub, "real": real}[kernel]
    return df.select(id_col, content_col).mapInPandas(fn, schema)


def sample_video_frames(
    df: DataFrame,
    every_n_seconds: float = 1.0,
    id_col: str = "media_id",
    content_col: str = "content",
    kernel: str = "stub",
) -> DataFrame:
    """Video → frame rows plumbing (one output row per sampled frame).
    Output grain: (media_id, frame_idx, frame_ts_sec, content).

    ``kernel="real"`` decodes animated GIF (functions/codecs.py — real
    LZW + palette + compositing, no external dep), samples frames whose
    timestamp (cumulative Graphic Control delays) crosses each
    ``every_n_seconds`` threshold, and emits each sampled frame re-encoded
    as PPM bytes; undecodable rows emit nothing (row-wise degradation).
    ``kernel="stub"`` raises NotImplementedError from the executor (other
    containers: av/ffmpeg for MP4/H.264) — the returned DataFrame's
    schema/partitioning is still real for plan inspection.
    ``kernel="fake"`` is a deterministic stand-in (duration inferred from
    byte length at a nominal bitrate; frame bytes = a slice at the frame
    offset) so the full explode-shaped pipeline executes and is testable:
    one input row fans out to a variable number of frame rows, exactly the
    batch shape a real av kernel produces."""
    schema = "media_id long, frame_idx int, frame_ts_sec double, content binary"
    nominal_bytes_per_sec = 256.0

    def stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "frame sampling requires av/ffmpeg; real kernel: "
            "av.open(bytes) -> decode -> sample every_n_seconds"
        )
        yield  # pragma: no cover

    def fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_ts_sec": [], "content": []}
            for mid, b in zip(pdf[id_col], pdf[content_col]):
                b = b or b""
                duration = len(b) / nominal_bytes_per_sec
                n_frames = max(int(duration / every_n_seconds), 1)
                for i in range(n_frames):
                    ts = i * every_n_seconds
                    off = int(ts * nominal_bytes_per_sec)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ts_sec"].append(round(ts, 6))
                    out["content"].append(b[off : off + 64])
            yield pd.DataFrame(out)

    def real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        from ecommerce_analytics_platform_spark.functions import codecs

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_ts_sec": [], "content": []}
            for mid, b in zip(pdf[id_col], pdf[content_col]):
                try:
                    frames, delays = codecs.decode_gif(bytes(b or b""))
                except ValueError:
                    continue
                t = 0.0
                next_sample = 0.0
                for i in range(len(frames)):
                    if t + 1e-9 >= next_sample:
                        out["media_id"].append(mid)
                        out["frame_idx"].append(i)
                        out["frame_ts_sec"].append(round(t, 6))
                        out["content"].append(codecs.encode_ppm(frames[i]))
                        next_sample += every_n_seconds
                    t += delays[i]
            yield pd.DataFrame(out)

    fn = {"stub": stub, "fake": fake, "real": real}[kernel]
    return df.select(id_col, content_col).mapInPandas(fn, schema)


def audio_features(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    kernel: str = "fake",
) -> DataFrame:
    """Audio feature extraction via Arrow-batched mapInPandas.

    ``kernel="real"``: parse RIFF/WAVE PCM16 with the pure-numpy codec —
    duration = n_samples / sample_rate, energy = RMS of the normalized
    signal (exact, tested on encoded fixtures); undecodable rows yield
    nulls. ``"fake"`` is the deterministic stand-in for compressed audio
    (duration from byte length at nominal 16 kHz/16-bit mono)."""
    schema = "media_id long, duration_sec double, energy double"

    def fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        for pdf in batches:
            out_d, out_e = [], []
            for b in pdf[content_col]:
                b = b or b""
                out_d.append(round(len(b) / (16000 * 2), 6))
                out_e.append(round(sum(b[:1024]) / max(min(len(b), 1024), 1) / 255.0, 6))
            yield pd.DataFrame(
                {"media_id": pdf[id_col].to_numpy(), "duration_sec": out_d, "energy": out_e}
            )

    def real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        from ecommerce_analytics_platform_spark.functions import codecs

        for pdf in batches:
            out_d, out_e = [], []
            for b in pdf[content_col]:
                try:
                    samples, rate = codecs.decode_wav_pcm16(b or b"")
                except ValueError:
                    out_d.append(None)
                    out_e.append(None)
                    continue
                out_d.append(round(samples.shape[0] / rate, 6))
                x = samples.astype(np.float64) / 32768.0
                out_e.append(round(float(np.sqrt((x * x).mean())), 6))
            yield pd.DataFrame(
                {"media_id": pdf[id_col].to_numpy(), "duration_sec": out_d, "energy": out_e}
            )

    fn = {"fake": fake, "real": real}[kernel]
    return df.select(id_col, content_col).mapInPandas(fn, schema)
