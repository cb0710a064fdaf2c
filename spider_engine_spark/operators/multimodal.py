"""Multimodal column plumbing: opaque binary media + typed metadata.

Media payloads are opaque `binary` columns with a typed metadata struct
(kind, codec, width/height/duration, byte length) — the standard lakehouse
layout for image/audio/video at 100 TB (payload stays columnar; metadata
prunes without touching bytes).

The decode/feature kernels run through `mapInPandas` (Arrow batches of
binary + metadata, never per-row Python at the API surface). The actual
codec work (PIL/ffmpeg/torchaudio) is NOT available in this container, so
`decode_media` dispatches to a deterministic fake decoder; the real-codec
branch raises NotImplementedError behind `require_codecs=True`. The
Spark-side contract — schema, batch shape, partition-preserving UDF
signature, metadata pruning — is real and tested.

Reference tie-in: spider-engine stores media-ish payloads as 'pure' text
fields (IDX_TYPE_PURE_TEXT, core/index/common.go:24 — stored, not
indexed); this module is the binary-era version of a forward-only field.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "struct<kind:string,codec:string,width:int,height:int,"
    "duration_ms:int,n_bytes:int>"
)

FEATURE_SCHEMA = (
    "doc_id string, kind string, feature array<float>, decode_ok boolean, "
    "n_bytes int"
)

THUMB_SCHEMA = "doc_id string, thumb binary, thumb_w int, thumb_h int"


def synth_media(df: DataFrame, doc_id: str = "doc_id") -> DataFrame:
    """Attach deterministic fake media columns (payload + metadata) to any
    table — the datagen path for multimodal tests/benchmarks.

    All derivations are md5-based so an independent SQL oracle can
    recompute every metadata/stat field from doc_id alone, while the
    Spark side actually round-trips the binary payload through Arrow:
    payload = md5(doc_id) digest repeated to n bytes, n = 256 + h[0]*16,
    kind = [image|audio|video][h[1] % 3] (h = the md5 digest bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for key in pdf["doc_id"].astype(str):
                h = hashlib.md5(key.encode()).digest()
                n = 256 + h[0] * 16
                payload = h * (n // 16 + 1)
                payloads.append(payload[:n])
                kind = ["image", "audio", "video"][h[1] % 3]
                metas.append(
                    {
                        "kind": kind,
                        "codec": {"image": "png", "audio": "pcm", "video": "h264"}[kind],
                        "width": 16 + h[2] % 64 if kind != "audio" else 0,
                        "height": 16 + h[3] % 64 if kind != "audio" else 0,
                        "duration_ms": (h[4] * 100) if kind != "image" else 0,
                        "n_bytes": n,
                    }
                )
            out = pdf[["doc_id"]].copy()
            out["media"] = payloads
            out["meta"] = metas
            yield out

    return df.select(F.col(doc_id).cast("string").alias("doc_id")).mapInPandas(
        gen, f"doc_id string, media binary, meta {MEDIA_META_SCHEMA}"
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decode+embed kernel: hash-seeded
    pseudo-features (unit-norm float32)."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def decode_media(
    df: DataFrame, dim: int = 16, require_codecs: bool = False
) -> DataFrame:
    """media binary -> feature vector, batched via mapInPandas.

    With require_codecs=True this is where PIL/ffmpeg would run — not
    installed in this container, so it raises; the deterministic fake
    keeps the distributed plumbing (Arrow batch shape, schema, metadata
    passthrough) fully exercised.
    """
    if require_codecs:
        raise NotImplementedError(
            "real media codecs (PIL/ffmpeg) are not available in this "
            "environment; run with require_codecs=False for the "
            "deterministic fake decoder"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [float(x) for x in _fake_decode(bytes(b), dim)]
                for b in pdf["media"]
            ]
            # integrity check of the Arrow binary round-trip: a payload
            # decodes ok iff its leading block is md5(doc_id) — exactly
            # how synth_media built it
            oks = [
                bytes(b)[:16] == hashlib.md5(str(k).encode()).digest()
                for k, b in zip(pdf["doc_id"], pdf["media"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "feature": feats,
                    "decode_ok": oks,
                    "n_bytes": [len(bytes(b)) for b in pdf["media"]],
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def thumbnail(df: DataFrame, max_side: int = 8) -> DataFrame:
    """Resize stub: emits a deterministic 'thumbnail' (truncated payload)
    with clamped dimensions — real PIL resize goes here."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, thumbs = [], [], []
            for m, b in zip(pdf["meta"], pdf["media"]):
                w, h = int(m["width"] or 0), int(m["height"] or 0)
                scale = max(w, h, 1)  # >= 1, safe divisor
                ws.append(min(w, max_side))
                hs.append(min(h, max_side))
                thumbs.append(bytes(b)[: max(32, len(bytes(b)) // scale)])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "thumb_w": ws,
                    "thumb_h": hs,
                }
            )

    return df.mapInPandas(fn, THUMB_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stub for video rows: emits (doc_id, frame_idx,
    ts_ms) rows from the duration metadata — the real ffmpeg frame
    extraction goes where the fake payload slice is."""
    frames = df.filter(F.col("meta.kind") == "video").select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.col("meta.duration_ms") / every_ms).cast("int") - 1,
                    F.lit(0),
                ),
            )
        ).alias("frame_idx"),
    )
    return frames.withColumn("ts_ms", F.col("frame_idx") * every_ms)
