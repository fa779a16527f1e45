"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata (SURVEY.md §2.8 / north-star extensions).

The Spark-side plumbing is REAL and tested — schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partition preservation.  The actual
codecs are NOT in this container, so decode is stubbed two ways:

- ``decoder=None`` (default) raises :class:`NotImplementedError` with
  the dependency it needs — the honest production posture;
- :func:`fake_decoder` — a deterministic stand-in (features derived
  from the md5 of the payload) so pipelines and tests exercise the full
  distributed path with stable outputs.

For PNG payloads specifically a REAL pure-stdlib codec ships in
:mod:`.png_codec` (``png_resizer`` / ``png_feature_decoder``) — genuine
decode/resize/feature work with no third-party dependency.

Scale: media bytes ride the same partitions as their metadata (one
scan), decode fans out per Arrow batch (bounded memory via
``spark.sql.execution.arrow.maxRecordsPerBatch``), and feature outputs
are fixed-width arrays — shuffle-friendly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, types as T

#: Canonical multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("kind", T.StringType(), True),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16


def fake_decoder(payload: bytes, kind: str) -> list[float]:
    """Deterministic stand-in for a codec: FEATURE_DIM floats in [0,1)
    derived from md5(payload).  Replace with a real decode+embed."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    h = hashlib.md5(payload).digest()
    return [h[i % 16] / 256.0 for i in range(FEATURE_DIM)]


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes, str], list[float]] | None = None,
    payload_col: str = "payload",
    kind_col: str = "kind",
) -> DataFrame:
    """Decode/feature-extract each media payload → adds
    ``features array<float>``.  Runs via ``mapInPandas`` so one Python
    worker handles an Arrow batch at a time (vectorized transfer, no
    per-row pickling); all other columns pass through untouched.
    """
    if decoder is None:
        raise NotImplementedError(
            "no media codec in this environment: pass decoder= (e.g. a "
            "Pillow/torchaudio-backed callable) or functions.multimodal."
            "fake_decoder for deterministic plumbing tests"
        )
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = [
                decoder(p, k) for p, k in zip(pdf[payload_col], pdf[kind_col])
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    payload_col: str = "payload",
) -> DataFrame:
    """Re-encode image payloads at (width, height).  Same mapInPandas
    plumbing; stub posture identical to :func:`extract_features`."""
    if resizer is None:
        raise NotImplementedError(
            "no image codec in this environment: pass resizer= (e.g. "
            "Pillow Image.resize) — the distributed plumbing is ready"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[payload_col] = [resizer(p, width, height) for p in pdf[payload_col]]
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


def sample_frames(
    df: DataFrame,
    every_ms: int,
    sampler: Callable[[bytes, int], list[tuple[int, bytes]]] | None = None,
) -> DataFrame:
    """Video → one row per sampled frame: (media_id, frame_ts_ms,
    frame_payload).  Row-multiplying mapInPandas (UDTF shape)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), True),
            T.StructField("frame_ts_ms", T.LongType(), True),
            T.StructField("frame_payload", T.BinaryType(), True),
        ]
    )
    if sampler is None:
        raise NotImplementedError(
            "no video codec in this environment: pass sampler= (e.g. "
            "pyav keyframe extraction) — the distributed plumbing is ready"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for ts, frame in sampler(r["payload"], every_ms):
                    rows.append(
                        {"media_id": r["media_id"], "frame_ts_ms": ts, "frame_payload": frame}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, schema=out_schema)


def fake_frame_sampler(payload: bytes, every_ms: int) -> list[tuple[int, bytes]]:
    """Deterministic stand-in: 3 'frames', each md5-derived."""
    if payload is None:
        return []
    return [
        (i * every_ms, hashlib.md5(payload + bytes([i])).digest()) for i in range(3)
    ]
