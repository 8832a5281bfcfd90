"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a struct of
metadata.  The Spark-side machinery — schema, partitioning, Arrow batch
shape, vectorized UDF signatures — is real and tested; the actual codec
calls are STUBBED (this container has no image/audio libraries): decode
parses a deterministic fake header, feature extraction digests payload
bytes.  Swapping in PIL/ffmpeg is confined to the two marked functions.

Header layout (fake, deterministic): magic 4B 'G5MM' | media_type 1B
(0=image,1=audio,2=video) | width int16 | height int16 | duration_ms uint32.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id long, media_type string, payload binary"
META_SCHEMA = (
    "doc_id long, media_type string, width int, height int, duration_ms long, n_bytes long"
)
FEATURE_DIM = 8
FEATURE_SCHEMA = f"doc_id long, features array<float>"
_MAGIC = b"G5MM"
_TYPES = ["image", "audio", "video"]


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media per document (pure function of doc_id/text).

    Vectorized mapInPandas: payload = header + repeated md5 keystream —
    stands in for real blobs while exercising the binary-column path."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, types = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = int(doc_id) % 3
                w = 16 + (int(doc_id) * 7) % 240
                h = 16 + (int(doc_id) * 13) % 240
                dur = (int(doc_id) * 37) % 60000
                header = _MAGIC + struct.pack("<BhhI", t, w, h, dur)
                seed = hashlib.md5(str(text).encode()).digest()
                body = (seed * ((w * h) // 16 + 1))[: w * h]
                payloads.append(header + body)
                types.append(_TYPES[t])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_type": types, "payload": payloads}
            )

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


def decode_metadata(media: DataFrame) -> DataFrame:
    """Parse typed metadata out of the binary column (vectorized).

    REAL-CODEC STUB: for actual JPEG/WAV/MP4, replace the header parse with
    PIL.Image.open / soundfile / pyav here — signature and batching stay."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # whole-batch header decode: one concat of the fixed 13-byte
            # prefixes, then columnar uint8 views — no per-field Python
            pays = [bytes(p) for p in pdf["payload"]]
            pref = np.frombuffer(
                b"".join(p[:13] for p in pays), dtype=np.uint8
            ).reshape(-1, 13)
            magic = np.frombuffer(_MAGIC, dtype=np.uint8)
            if not (pref[:, :4] == magic).all():
                raise NotImplementedError(
                    "real codec decode not available in this container; "
                    "only G5MM fake headers are supported"
                )
            w = pref[:, 5:7].copy().view("<i2").ravel().astype(np.int32)
            h = pref[:, 7:9].copy().view("<i2").ravel().astype(np.int32)
            dur = pref[:, 9:13].copy().view("<u4").ravel().astype(np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype(np.int64),
                    "media_type": pdf["media_type"],
                    "width": w,
                    "height": h,
                    "duration_ms": dur,  # int64: a uint32 header value must not wrap negative
                    "n_bytes": np.fromiter((len(p) for p in pays), np.int64, len(pays)),
                }
            )

    return media.mapInPandas(parse, META_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """FEATURE_DIM-float embedding per payload (digest-based deterministic
    fake; a real model forward pass slots into the same mapInPandas)."""

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # md5 itself is per-payload (hashlib API), but the digest →
            # float decode is ONE whole-batch frombuffer + reshape instead
            # of a per-row loop (round-3 vectorization, same pattern as
            # decode_metadata's columnar header parse)
            digests = b"".join(
                hashlib.md5(bytes(p)).digest()[: FEATURE_DIM * 2] for p in pdf["payload"]
            )
            out = (
                np.frombuffer(digests, dtype=np.uint16)
                .reshape(len(pdf), FEATURE_DIM)
                .astype(np.float32)
                / 65535.0
            )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "features": [row for row in out]}
            )

    return media.mapInPandas(feat, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, ts_ms long, frame binary"


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 32
) -> DataFrame:
    """Sample video frames at a fixed timestamp stride — one output row per
    (doc_id, frame): frame_idx i covers ts_ms = i*every_ms < duration_ms.

    Scale shape: the non-video filter runs JVM-side BEFORE the UDF (column
    pruning + pushdown keep image/audio payload bytes out of the Arrow
    transfer entirely), and per-video fan-out is hard-capped at
    ``max_frames`` so a pathological 10-hour clip cannot explode a task —
    the cap is the same explicit-bound contract as dedup's
    ``max_bucket_size``.  REAL-CODEC STUB: actual frame extraction (pyav /
    ffmpeg) slots into the marked loop; for fake G5MM payloads each frame
    is a deterministic 64-byte slice of the body keyed by frame_idx, so
    plumbing, batching, and fan-out are exercised for real."""
    if every_ms <= 0:
        # r5 ADVICE: fail at the driver, not as a ZeroDivisionError inside
        # an executor UDF half a job later
        raise ValueError(f"every_ms must be positive, got {every_ms}")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, blobs = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != _MAGIC:
                    raise NotImplementedError(
                        "real video frame extraction requires ffmpeg/pyav"
                    )
                dur = struct.unpack("<I", b[9:13])[0]
                body = b[13:] or b"\x00"
                n = min(max(-(-dur // every_ms), 1), max_frames)
                # all-frame offsets in one vectorized shot; the slice loop
                # below is the real-codec substitution point
                offs = (np.arange(n, dtype=np.int64) * 64) % len(body)
                for i, off in enumerate(offs):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    tss.append(i * every_ms)
                    chunk = body[off : off + 64]
                    if len(chunk) < 64:  # r5 ADVICE: frames are EXACTLY 64 B
                        chunk = (chunk + body * (64 // len(body) + 1))[:64]
                    blobs.append(chunk)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": blobs}
            )

    return media.filter(F.col("media_type") == "video").select(
        "doc_id", "payload"
    ).mapInPandas(frames, FRAME_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL-CODEC STUB: raises for non-fake payloads; for fake payloads
    rewrites the header dims (plumbing test of binary transform)."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                if b[:4] != _MAGIC:
                    raise NotImplementedError("real image resize requires PIL")
                t = b[4:5]
                dur = b[9:13]
                payloads.append(_MAGIC + t + struct.pack("<hh", width, height) + dur + b[13:])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_type": pdf["media_type"], "payload": payloads}
            )

    return media.mapInPandas(rs, MEDIA_SCHEMA)
