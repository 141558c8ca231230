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


def _fake_decode_series(blobs: pd.Series) -> pd.DataFrame:
    """DETERMINISTIC FAKE decode, vectorized over the whole Arrow batch:
    derives (n_bytes, width, height) from the payload length. A real decoder
    (PIL.Image.open etc.) would replace this one function; it is
    arithmetic-only so the DuckDB oracle can verify the plumbing. No
    Python-per-blob loop — one ``len`` map then pure pandas arithmetic."""
    n = blobs.map(len).astype("int64")
    return pd.DataFrame({"n_bytes": n, "width": n % 64 + 1, "height": (n // 64) % 64 + 1})


def extract_meta(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """binary column → metadata rows, one Arrow batch at a time."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = _fake_decode_series(pdf[blob_col])
            meta.insert(0, "doc_id", pdf[id_col].astype("int64").values)
            yield meta

    return df.mapInPandas(op, schema=META_SCHEMA)


def resize_blob(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob",
                factor: int = 2) -> DataFrame:
    """Fake RESIZE: deterministic downsample keeping every ``factor``-th
    byte (a real impl decodes, bilinear-resamples and re-encodes — this
    preserves the Spark shape: binary in, smaller binary + refreshed typed
    metadata out, one Arrow batch at a time, no Python-per-byte loop —
    ``b[::factor]`` is a single C-level slice per payload)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            small = pdf[blob_col].map(lambda b: bytes(b[::factor]))
            meta = _fake_decode_series(small)
            meta.insert(0, "doc_id", pdf[id_col].astype("int64").values)
            meta["blob"] = small
            yield meta

    return df.mapInPandas(
        op, schema=META_SCHEMA + ", blob binary"
    )


def frame_sample(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob",
                 every: int = 16) -> DataFrame:
    """Frame-sampling plumbing: emits one row per sampled 'frame' (byte
    window) — the row-expansion shape a video pipeline needs. Fake frames:
    fixed-size byte windows; a real impl would demux containers.
    Output can fan out >1 row per input row (tested)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            lens = pdf[blob_col].map(len).clip(lower=1).to_numpy()
            nfr = -(-lens // every)  # ceil-div: frames per blob
            ids = np.repeat(pdf[id_col].to_numpy(), nfr)
            fidx = np.concatenate([np.arange(n) for n in nfr]) if len(nfr) else np.array([], "int64")
            # per-frame byte-window slice (variable-length blobs are ragged —
            # this comprehension is over FRAMES, bounded by the fan-out, not a
            # per-byte decode loop; a real demuxer replaces it wholesale)
            payload = [
                bytes(b[j * every : (j + 1) * every])
                for b, n in zip(pdf[blob_col], nfr)
                for j in range(n)
            ]
            yield pd.DataFrame({"doc_id": ids, "frame_idx": fidx.astype("int32"), "frame": payload})

    return df.mapInPandas(op, schema="doc_id bigint, frame_idx int, frame binary")
