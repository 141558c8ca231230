"""Per-data-file key Bloom filters, stored as sidecars (Iceberg Puffin /
Delta deletion-vector-style auxiliary files: ``<file>.parquet.bloom``).

Why sidecars and not parquet-internal bloom filters: pyarrow can neither
write nor read parquet's own column bloom filters, and a sidecar keeps the
bitmap out of the JSON manifests (a 1M-row file at 10 bits/key is ~1.2 MiB —
fine as one adjacent file, catastrophic inlined into every manifest read).

Why blooms at all: high-cardinality keys make per-file min/max nearly
useless for point lookups (every file's [min,max] spans the whole key
space), so ``read_keys`` would open every file in the bucket. A 10-bit/key
bloom answers "definitely not here" with ~1% false positives, cutting a
point lookup from O(files-in-bucket) parquet opens to ~1.

Build cost is why this is NOT on the hot ingest path: hashing every key of
every file would tax the CDC replay headline. Blooms are built where Iceberg
builds its read-optimizing stats — at compaction (``sort_within=True``
rewrites) — or on tables that opt in via the ``bloom_on_write`` property.

Hashing is ``pandas.util.hash_array`` (vectorized SipHash-1-3) with two
fixed 16-byte keys; the classic double-hashing scheme h1 + i*h2 (Kirsch &
Mitzenmacher 2006) derives all k probes from the two lanes. ``m`` is a
power of two so the modulo is a mask. Determinism holds between writer and
reader because both run the same library in the same environment; a sidecar
is rebuilt whenever its data file is rewritten.
"""

from __future__ import annotations

import base64
import json

import numpy as np
import pandas as pd

_KEY1 = "cc-etl-bloom-k1!"
_KEY2 = "cc-etl-bloom-k2!"


def _hash_lanes(keys: list | np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    # Canonicalize to str HERE, not at call sites: the build side hashes
    # str(v) of parquet values while probes arrive as the caller's raw
    # (possibly int) key values — hashing different types for the same
    # logical key would produce bloom FALSE NEGATIVES, i.e. silently
    # dropped rows from point lookups on non-string key columns.
    arr = np.asarray(
        [k if isinstance(k, str) else str(k) for k in keys], dtype=object
    )
    h1 = pd.util.hash_array(arr, hash_key=_KEY1)
    # odd stride → the probe sequence walks the full power-of-two ring
    h2 = pd.util.hash_array(arr, hash_key=_KEY2) | np.uint64(1)
    return h1, h2


def build(keys, bits_per_key: int = 10, n_hashes: int = 7) -> dict:
    """Bloom filter over ``keys``; ~1% FPR at the defaults."""
    n = max(len(keys), 1)
    m = 1 << int(np.ceil(np.log2(max(n * bits_per_key, 64))))
    bits = np.zeros(m, dtype=bool)
    if len(keys):
        h1, h2 = _hash_lanes(keys)
        mask = np.uint64(m - 1)
        for i in range(n_hashes):
            bits[(h1 + np.uint64(i) * h2) & mask] = True
    return {"m": m, "k": n_hashes, "bits": bits}


def dumps(bf: dict) -> bytes:
    packed = np.packbits(bf["bits"])
    return json.dumps(
        {"m": bf["m"], "k": bf["k"],
         "b64": base64.b64encode(packed.tobytes()).decode()}
    ).encode()


def loads(raw: bytes) -> dict:
    d = json.loads(raw)
    bits = np.unpackbits(
        np.frombuffer(base64.b64decode(d["b64"]), dtype=np.uint8)
    ).astype(bool)[: d["m"]]
    return {"m": d["m"], "k": d["k"], "bits": bits}


def maybe_contains_any(bf: dict, keys: list[str]) -> bool:
    """False ⇒ NONE of ``keys`` is in the file (no false negatives);
    True ⇒ at least one may be."""
    if not keys:
        return False
    h1, h2 = _hash_lanes(keys)
    mask = np.uint64(bf["m"] - 1)
    alive = np.ones(len(h1), dtype=bool)
    for i in range(bf["k"]):
        alive[alive] = bf["bits"][(h1[alive] + np.uint64(i) * h2[alive]) & mask]
        if not alive.any():
            return False
    return True
