"""Multimodal column plumbing: image/audio/video as opaque binary.

North-star surface (build brief): binary payload columns with typed
metadata, plus decode / feature-extract / resize / frame-sample stages
as Arrow-batched pandas UDFs over ``mapInPandas``. The image/audio
codec libraries are NOT in this container, so the codec call itself is
stubbed (``decode_image`` raises NotImplementedError unless
``fake=True``); everything Spark-side — schema, partition behavior,
UDF signature, Arrow batch shape — is real and tested.

The deterministic fake decoder derives metadata purely from the bytes
(md5-seeded), so results are stable across runs/engines and the
pipeline stays benchmarkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, format string, width int, height int"
)


def binarize(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Turn a text column into an opaque binary payload column — the
    shape of an image/audio ingest table: (id, payload binary,
    n_bytes, checksum)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )


def decode_image(data: bytes, fake: bool = False) -> tuple[str, int, int]:
    """Decode an image payload → (format, width, height).

    STUB: real decoding needs Pillow/libvips which are not in this
    container. ``fake=True`` returns deterministic metadata seeded by
    the payload digest so the distributed plumbing can be exercised and
    verified end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "pass fake=True for the deterministic test decoder"
        )
    d = hashlib.md5(data).digest()
    fmt = ("png", "jpeg", "webp")[d[0] % 3]
    width = 64 + (int.from_bytes(d[1:3], "big") % 1024)
    height = 64 + (int.from_bytes(d[3:5], "big") % 1024)
    return fmt, width, height


def extract_image_meta(binary_df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature-extraction stage: per-partition Arrow batches
    in, one metadata row per payload out. This is the pattern a real
    decode/resize/frame-sample stage uses — swap the stub for a codec
    call and the distributed shape is unchanged."""

    def _extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            metas = [decode_image(b, fake=fake) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "format": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                }
            )

    return binary_df.mapInPandas(_extract, schema=IMAGE_META_SCHEMA)


AUDIO_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, codec string, sample_rate int,"
    " channels int, duration_ms int, n_samples bigint"
)


def decode_audio(data: bytes, fake: bool = False) -> tuple[str, int, int, int]:
    """Decode an audio payload → (codec, sample_rate, channels,
    duration_ms). STUB like ``decode_image``: real decoding needs
    ffmpeg/soundfile, absent here; ``fake=True`` derives deterministic
    metadata from the payload digest."""
    if not fake:
        raise NotImplementedError(
            "audio codecs not available in this environment; "
            "pass fake=True for the deterministic test decoder"
        )
    d = hashlib.md5(data).digest()
    codec = ("wav", "mp3", "flac")[d[0] % 3]
    sample_rate = (8000, 16000, 22050, 44100, 48000)[d[1] % 5]
    channels = 1 + d[2] % 2
    duration_ms = 500 + int.from_bytes(d[3:5], "big") % 60000
    return codec, sample_rate, channels, duration_ms


def extract_audio_meta(binary_df: DataFrame, fake: bool = True) -> DataFrame:
    """Audio feature-extraction stage over the same mapInPandas plumbing
    as ``extract_image_meta``; adds the derived sample count (the number
    a training pipeline budgets audio-token counts from)."""

    def _extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            metas = [decode_audio(b, fake=fake) for b in pdf["payload"]]
            duration = [m[3] for m in metas]
            rate = [m[1] for m in metas]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "codec": [m[0] for m in metas],
                    "sample_rate": rate,
                    "channels": [m[2] for m in metas],
                    "duration_ms": duration,
                    "n_samples": [
                        dm * r // 1000 for dm, r in zip(duration, rate)
                    ],
                }
            )

    return binary_df.mapInPandas(_extract, schema=AUDIO_META_SCHEMA)


RESIZED_SCHEMA = IMAGE_META_SCHEMA + ", new_width int, new_height int"


def resize_images(meta_df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize stage: aspect-preserving clamp of the longer side to
    ``max_side`` (no-op when already small enough). A real implementation
    would transform the payload through a codec; the stub computes the
    target geometry — which is the part a pipeline plans storage and
    batch shapes around — over the same mapInPandas plumbing."""

    def _resize(batches: Iterator) -> Iterator:
        for pdf in batches:
            long_side = pdf[["width", "height"]].max(axis=1)
            scale = (max_side / long_side).clip(upper=1.0)
            out = pdf.copy()
            # floor via int-cast, matching the oracle's integer math
            out["new_width"] = (pdf["width"] * scale).astype(int)
            out["new_height"] = (pdf["height"] * scale).astype(int)
            yield out

    return meta_df.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_ts double, frame_checksum string"


def sample_frames(binary_df: DataFrame, max_frames: int = 4) -> DataFrame:
    """Frame-sampling stage for video payloads: one input row fans out
    to up to ``max_frames`` evenly-spaced frame rows (the 1→N batch
    shape that distinguishes this stage from per-row decode). Duration
    and frame checksums are deterministic digest fakes; a real decoder
    swaps in container demux + keyframe seek with the same schema."""

    def _sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_ts": [], "frame_checksum": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                d = hashlib.md5(data).digest()
                duration = 1 + d[5] % 60  # fake seconds
                n = min(max_frames, duration)
                for i in range(n):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_ts"].append(round(i * duration / n, 6))
                    rows["frame_checksum"].append(
                        hashlib.md5(data + b"#%d" % i).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return binary_df.mapInPandas(_sample, schema=FRAME_SCHEMA)


EMBED_SCHEMA = "doc_id bigint, embedding array<double>"


def embed_image(binary_df: DataFrame, dims: int = 8) -> DataFrame:
    """Feature-extraction stage: payload → embedding vector, the bridge
    from multimodal ingest into the vector operators (ANN search,
    near-dup, clustering all consume its output schema). STUB like the
    decoders — a real implementation runs a vision encoder over the
    same Arrow-batched mapInPandas plumbing; the fake derives
    ``dims`` components from digest byte pairs (uniform in [0, 1],
    deterministic across runs/engines, restatable in SQL)."""
    assert dims <= 8  # one md5 digest = 16 bytes = 8 pairs

    def _embed(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            embs = []
            for payload in pdf["payload"]:
                d = hashlib.md5(bytes(payload)).digest()
                embs.append(
                    [
                        int.from_bytes(d[2 * i: 2 * i + 2], "big") / 65535.0
                        for i in range(dims)
                    ]
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": embs})

    return binary_df.mapInPandas(_embed, schema=EMBED_SCHEMA)
