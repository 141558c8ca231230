"""Deterministic synthetic binlog generator (FIXTURES.md F2, seed-fixed).

Generates JSONL event files (lexicographic file order = log order) with:

* zipf-ish hot keys (~1% of doc_ids receive ~50% of events — exercises the
  skew path),
* insert/update/delete mix,
* a fraction of payloads arriving in the wrapped-text form
  ``"{'no': '12 7 9'}"`` (the reference's stringified-dict accident,
  ``/root/reference/files/transform.py:37``) → exercises normalization,
* a fraction of wrong/NULL ``n_tok`` → exercises the recompute invariant,
* malformed lines / unknown ops / null keys → exercise the DLQ,
* optional schema_change events (add / rename / widen).

NumPy-vectorized; ~10^6 events/s generation locally so the bench can build
multi-million-event logs per run.
"""

from __future__ import annotations

import json
import os

import numpy as np

SOURCES = np.array(["crawl", "curated", "synthetic"])
OPS = np.array(["insert", "update", "delete"])


def generate_binlog(
    out_dir: str,
    n_events: int = 10_000,
    n_docs: int = 1_000,
    n_files: int = 10,
    seed: int = 42,
    max_tokens: int = 64,
    vocab: int = 50_257,
    p_delete: float = 0.05,
    p_wrapped: float = 0.15,
    p_wrong_ntok: float = 0.10,
    p_null_ntok: float = 0.05,
    p_malformed: float = 0.01,
    hot_frac: float = 0.01,
    hot_mass: float = 0.5,
    schema_changes: list[dict] | None = None,
    start_lsn: int = 0,
    prefix: str = "binlog",
) -> list[str]:
    """Write ``n_files`` JSONL files to ``out_dir``; returns file paths."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    n_hot = max(1, int(n_docs * hot_frac))
    hot = rng.random(n_events) < hot_mass
    doc_idx = np.where(
        hot,
        rng.integers(0, n_hot, n_events),
        rng.integers(n_hot, n_docs, n_events),
    )
    is_delete = rng.random(n_events) < p_delete
    is_insert = (~is_delete) & (rng.random(n_events) < 0.3)
    lens = rng.integers(1, max_tokens + 1, n_events)
    src_idx = rng.integers(0, 3, n_events)
    wrapped = rng.random(n_events) < p_wrapped
    wrong_ntok = rng.random(n_events) < p_wrong_ntok
    null_ntok = rng.random(n_events) < p_null_ntok
    malformed = rng.random(n_events) < p_malformed
    # event_ts: monotone-ish with jitter so LWW ordering is exercised
    base_us = rng.integers(0, 5_000_000, n_events).cumsum()
    jitter = rng.integers(-2_000_000, 2_000_000, n_events)
    ts_us = np.maximum(base_us + jitter, 0)

    sc_at = {}
    for sc in schema_changes or []:
        sc_at[int(sc["at_event"])] = sc

    paths: list[str] = []
    per_file = (n_events + n_files - 1) // n_files
    eid = 0
    for fi in range(n_files):
        path = os.path.join(out_dir, f"{prefix}-{fi:06d}.jsonl")
        with open(path, "w") as f:
            for _ in range(min(per_file, n_events - eid)):
                if eid in sc_at:
                    sc = sc_at[eid]
                    f.write(
                        json.dumps(
                            {
                                "op": "schema_change",
                                "doc_id": None,
                                "event_ts": _iso(ts_us[eid]),
                                "lsn": start_lsn + eid,
                                "schema_version": sc.get("schema_version", 2),
                                "payload": None,
                                "schema_change": {
                                    "kind": sc["kind"],
                                    "column": sc["column"],
                                    "new_name": sc.get("new_name"),
                                    "new_type": sc.get("new_type"),
                                },
                            }
                        )
                        + "\n"
                    )
                    eid += 1
                    continue
                if malformed[eid]:
                    kind = eid % 3
                    if kind == 0:
                        f.write("{this is not json\n")
                    elif kind == 1:
                        f.write(
                            json.dumps(
                                {
                                    "op": "upsert",  # unknown op
                                    "doc_id": f"doc-{doc_idx[eid]:06d}",
                                    "event_ts": _iso(ts_us[eid]),
                                    "lsn": start_lsn + eid,
                                    "schema_version": 1,
                                    "payload": None,
                                }
                            )
                            + "\n"
                        )
                    else:
                        f.write(
                            json.dumps(
                                {
                                    "op": "update",
                                    "doc_id": None,  # null key
                                    "event_ts": _iso(ts_us[eid]),
                                    "lsn": start_lsn + eid,
                                    "schema_version": 1,
                                    "payload": None,
                                }
                            )
                            + "\n"
                        )
                    eid += 1
                    continue
                doc = f"doc-{doc_idx[eid]:06d}"
                ev: dict = {
                    "op": "delete" if is_delete[eid] else ("insert" if is_insert[eid] else "update"),
                    "doc_id": doc,
                    "event_ts": _iso(ts_us[eid]),
                    "lsn": start_lsn + eid,
                    "schema_version": 1,
                }
                if ev["op"] == "delete":
                    ev["payload"] = None
                else:
                    toks = ((doc_idx[eid] * 2654435761 + start_lsn + eid) % vocab
                            + np.arange(lens[eid])) % vocab
                    toks = toks.astype(int).tolist()
                    n_tok: int | None = len(toks)
                    if null_ntok[eid]:
                        n_tok = None
                    elif wrong_ntok[eid]:
                        n_tok = len(toks) + 7
                    payload: dict = {
                        "n_tok": n_tok,
                        "source": str(SOURCES[src_idx[eid]]),
                    }
                    if wrapped[eid]:
                        payload["tokens"] = None
                        payload["tokens_raw"] = "{'no': '" + " ".join(map(str, toks)) + "'}"
                    else:
                        payload["tokens"] = toks
                        payload["tokens_raw"] = None
                    ev["payload"] = payload
                ev["schema_change"] = None
                f.write(json.dumps(ev) + "\n")
                eid += 1
        paths.append(path)
        if eid >= n_events:
            break
    return paths


def _iso(us: int) -> str:
    """Epoch-microseconds → ISO timestamp string (UTC, no tz suffix)."""
    s, rem = divmod(int(us), 1_000_000)
    import datetime as dt

    t = dt.datetime(1970, 1, 1) + dt.timedelta(seconds=s, microseconds=rem)
    return t.strftime("%Y-%m-%dT%H:%M:%S.%f")
