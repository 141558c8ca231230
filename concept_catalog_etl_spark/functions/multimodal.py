"""Multimodal column plumbing: opaque binary payloads → typed metadata /
features via Arrow-batched ``mapInPandas``.

Real pipelines store image/audio/video as ``binary`` columns with typed
metadata and run decode / feature-extract / resize / frame-sample as
vectorized UDFs. The decode libraries (PIL/ffmpeg/etc.) are NOT in this
container, so the decode step is a **deterministic fake** computed from the
bytes (clearly marked below); everything Spark-side — schema, binary
transport, Arrow batch iteration, partitioning — is real and tested.
Swapping ``_fake_decode`` for a real decoder is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

META_SCHEMA = "doc_id bigint, n_bytes bigint, width bigint, height bigint"


def _fake_decode(b: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE decode: derives (n_bytes, width, height) from the
    payload bytes. A real decoder (PIL.Image.open etc.) would replace this;
    it is arithmetic-only so the DuckDB oracle can verify the plumbing."""
    n = len(b)
    return n, n % 64 + 1, (n // 64) % 64 + 1


def extract_meta(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """binary column → metadata rows, one Arrow batch at a time."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                }
            )

    return df.mapInPandas(op, schema=META_SCHEMA)


def frame_sample(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob",
                 every: int = 16) -> DataFrame:
    """Frame-sampling plumbing: emits one row per sampled 'frame' (byte
    window) — the row-expansion shape a video pipeline needs. Fake frames:
    fixed-size byte windows; a real impl would demux containers.
    Output can fan out >1 row per input row (tested)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, payload = [], [], []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                for j, off in enumerate(range(0, max(len(b), 1), every)):
                    ids.append(i)
                    fidx.append(j)
                    payload.append(bytes(b[off : off + every]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": fidx, "frame": payload})

    return df.mapInPandas(op, schema="doc_id bigint, frame_idx int, frame binary")
