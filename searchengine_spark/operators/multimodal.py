"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Scale extension for training-data pipelines (no reference analog): media
payloads travel as ``binary`` columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages.  The actual codec calls are STUBBED (this container ships no
image/audio libraries): ``decode_images(..., impl="pil")`` raises
``NotImplementedError`` where Pillow would be called, and the default
``impl="fake"`` produces a DETERMINISTIC fake decode (seeded by the content
hash) so the Spark-side plumbing — schema, batch shape, partitioning,
column pruning — is real and tested end-to-end.

Design rules baked in (the 100 TB part):

- binary payloads are NEVER shuffled: every stage is a narrow map; joins
  against metadata happen on ``media_id`` with the payload projected away
  first;
- Arrow batch size bounds executor memory: ``maxRecordsPerBatch`` /
  ``spark.sql.execution.arrow.maxBytesPerBatch`` are the knobs, and the
  decode UDF processes one Arrow batch at a time as an iterator (no
  whole-partition materialization);
- fixed-size feature vectors come back as ``array<float>`` ready for
  operators/ann.py.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd
    from pyspark.sql import DataFrame

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def synthesize_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic media table derived from the documents table: payload =
    utf-8 bytes of text (opaque stand-in), metadata derived from content.
    Real pipelines read this from parquet/Iceberg with the same schema."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.pmod(F.xxhash64("text"), F.lit(512)) + 32).cast("int").alias("width"),
            (F.pmod(F.xxhash64("text", F.lit(1)), F.lit(512)) + 32).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.xxhash64("text", F.lit(2)), F.lit(240)) + 1).cast("int").alias("n_frames"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def _fake_pixels(payload: bytes, w: int, h: int, channels: int = 3):
    """Deterministic fake decode: pixels seeded by sha256(payload)."""
    import numpy as np

    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, channels), dtype=np.uint8)


def decode_images(media: DataFrame, impl: str = "fake",
                  target: tuple[int, int] = (32, 32)) -> DataFrame:
    """payload -> resized pixel feature vector (mean-pooled per channel +
    64-dim histogram), schema ``(media_id, width, height, features:array<float>)``.

    ``impl='pil'`` is the real-decoder slot — NotImplementedError here, by
    design (no Pillow in this container); the Arrow plumbing around it is
    identical either way.
    """
    narrowed = media.select("media_id", "payload", "meta.width", "meta.height")
    tw, th = target

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            if pdf.empty:
                continue
            feats, ws, hs = [], [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                if impl == "pil":
                    raise NotImplementedError(
                        "real image decode requires Pillow; run with impl='fake' "
                        "in this container"
                    )
                px = _fake_pixels(bytes(payload), int(w), int(h))
                # 'resize': nearest-neighbor index sampling (vectorized)
                yi = (np.linspace(0, px.shape[0] - 1, th)).astype(int)
                xi = (np.linspace(0, px.shape[1] - 1, tw)).astype(int)
                small = px[yi][:, xi]
                hist = np.bincount(small.reshape(-1) // 4, minlength=64)[:64]
                f = np.concatenate([
                    small.reshape(-1, 3).mean(axis=0) / 255.0,
                    hist / hist.sum(),
                ]).astype(np.float32)
                feats.append(f.tolist())
                ws.append(int(w))
                hs.append(int(h))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "width": ws, "height": hs,
                 "features": feats}
            )

    return narrowed.mapInPandas(
        _batches,
        schema="media_id long, width int, height int, features array<float>",
    )


def resize_images(media: DataFrame, target: tuple[int, int] = (64, 64),
                  impl: str = "fake") -> DataFrame:
    """Standalone resize stage: payload -> decoded -> nearest-neighbor
    resampled -> re-encoded raw-RGB payload (the store-the-thumbnail
    pipeline step), schema ``(media_id, width, height, payload:binary)``
    with width/height = the new dims.  Payload bytes stay inside their
    partition (one mapInPandas, no shuffle); ``impl='pil'`` is the real
    decoder slot (NotImplementedError — no Pillow in this container)."""
    narrowed = media.select("media_id", "payload", "meta.width", "meta.height")
    tw, th = target

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            if pdf.empty:
                continue
            payloads = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                if impl == "pil":
                    raise NotImplementedError(
                        "real image resize requires Pillow; run with "
                        "impl='fake' in this container"
                    )
                px = _fake_pixels(bytes(payload), int(w), int(h))
                yi = (np.linspace(0, px.shape[0] - 1, th)).astype(int)
                xi = (np.linspace(0, px.shape[1] - 1, tw)).astype(int)
                payloads.append(px[yi][:, xi].tobytes())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"],
                 "width": [tw] * len(payloads),
                 "height": [th] * len(payloads),
                 "payload": payloads}
            )

    return narrowed.mapInPandas(
        _batches,
        schema="media_id long, width int, height int, payload binary",
    )


def _fake_pcm(payload: bytes, n_samples: int):
    """Deterministic fake audio decode: float32 PCM in [-1, 1] seeded by
    sha256(payload) — the audio twin of :func:`_fake_pixels`."""
    import numpy as np

    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return (rng.random(n_samples, dtype=np.float32) * 2.0) - 1.0


def extract_audio_features(media: DataFrame, impl: str = "fake",
                           frame: int = 512, n_bands: int = 32,
                           seconds: float = 1.0) -> DataFrame:
    """payload -> fixed-dim audio feature vector, schema
    ``(media_id, sample_rate, features: array<float>)``.

    Features per clip (all vectorized numpy over framed PCM): per-frame RMS
    energy and zero-crossing rate (mean + std of each = 4 dims) followed by
    an ``n_bands``-bin log-magnitude spectrum averaged over frames (rfft) —
    a deterministic stand-in with the exact shape of a mel-filterbank
    pipeline.  ``impl='librosa'`` is the real-decoder slot and raises
    NotImplementedError by design (no audio libraries in this container);
    the Arrow plumbing — iterator batches, payload never shuffled, fixed
    ``array<float>`` width feeding operators/ann.py — is identical and
    tested either way."""
    narrowed = media.filter(F.col("kind") == "audio").select(
        "media_id", "payload", "meta.sample_rate"
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            if pdf.empty:
                continue
            feats = []
            for payload, sr in zip(pdf["payload"], pdf["sample_rate"]):
                if impl == "librosa":
                    raise NotImplementedError(
                        "real audio decode requires an audio library; run "
                        "with impl='fake' in this container"
                    )
                n = max(frame, int(int(sr) * seconds))
                pcm = _fake_pcm(bytes(payload), n - (n % frame))
                frames = pcm.reshape(-1, frame)
                rms = np.sqrt((frames ** 2).mean(axis=1))
                zcr = (np.diff(np.signbit(frames), axis=1) != 0).mean(axis=1)
                mag = np.abs(np.fft.rfft(frames, axis=1))[:, 1:]
                bands = np.log1p(
                    mag[:, : (mag.shape[1] // n_bands) * n_bands]
                    .reshape(frames.shape[0], n_bands, -1)
                    .mean(axis=2)
                ).mean(axis=0)
                f = np.concatenate([
                    [rms.mean(), rms.std(), zcr.mean(), zcr.std()], bands,
                ]).astype(np.float32)
                feats.append(f.tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"],
                 "sample_rate": pdf["sample_rate"],
                 "features": feats}
            )

    return narrowed.mapInPandas(
        _batches,
        schema="media_id long, sample_rate int, features array<float>",
    )


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling: one row per sampled frame index (metadata-only
    planning stage — JVM-side sequence/explode, payload untouched and
    unshuffled; the per-frame decode would chain decode_images)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata analytics: only the byte-size aggregate touches the
    payload; drop it and Catalyst prunes the binary column out of the scan
    entirely (visible in .explain ReadSchema)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.avg("meta.width").alias("avg_width"),
        F.sum(F.length("payload")).alias("total_bytes"),
    )
