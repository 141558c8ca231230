"""CDC over a live TCP socket (Spark's built-in ``socket`` streaming source).

Closes the transport seam left by the no-network-to-the-outside sandbox: the
file-directory transport is swapped for a real wire — same newline-delimited
envelopes, same foreachBatch sink, same final state as the batch replay of
the identical event sequence. The socket is NOT replayable, so the suite
also proves the composition the module docs claim: producer re-send
(at-least-once delivery) × idempotent sink (LWW upsert — the reference's
``$set``, /root/reference/files/load.py:20-22) = exactly-once state.
"""

import json
import os
import socket
import threading
import time

import pytest

from concept_catalog_etl_spark.operators.merge import MergeConfig
from concept_catalog_etl_spark.oracle import replay_dir
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.replay import replay_stream

from helpers import assert_state_equals_oracle, make_table, table_state
from test_debezium_source import _deb_line


def _serve(lines: list[str]):
    """One-shot TCP server: accept a single client, stream the lines, then
    hold the connection open until ``done`` is set (a closed socket would
    fail the source mid-test). Returns (port, done_event)."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    done = threading.Event()

    def run():
        try:
            conn, _ = srv.accept()
            try:
                conn.sendall(("\n".join(lines) + "\n").encode())
                done.wait(timeout=180)
            finally:
                conn.close()
        finally:
            srv.close()

    threading.Thread(target=run, daemon=True).start()
    return port, done


def _await(predicate, timeout=120.0, tick=0.5) -> bool:
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if predicate():
            return True
        time.sleep(tick)
    return False


def _run_socket_session(spark, table, ckpt, lines, *, source_format,
                        writer_id, converged, settle=2.0):
    """Serve ``lines`` over TCP, tail them into ``table``, wait for
    ``converged()`` (then ``settle`` seconds for any same-burst stragglers
    in a later micro-batch), stop the query."""
    port, done = _serve(lines)
    q = replay_stream(
        spark, None, table, ckpt,
        cfg=MergeConfig(writer_id=writer_id),
        source_format=source_format, socket_port=port,
        await_termination=False,
    )
    try:
        ok = _await(converged)
        if ok:
            time.sleep(settle)
    finally:
        done.set()
        q.stop()
        q.awaitTermination(30)
    assert ok, "socket session never converged"


def _max_lsn(lines: list[str]) -> int:
    """Greatest LSN among valid data/schema events in the feed (the binlog
    generator emits LSNs in line order, so this is the last applied line)."""
    best = -1
    for ln in lines:
        try:
            ev = json.loads(ln)
        except json.JSONDecodeError:
            continue
        lsn = ev.get("lsn", ev.get("source", {}).get("lsn") if isinstance(ev.get("source"), dict) else None)
        if isinstance(lsn, int):
            best = max(best, lsn)
    return best


def _offsets_reached(table, lsn: int):
    def check() -> bool:
        offs = table.properties().get("lineage_offsets", {})
        return bool(offs) and max(offs.values()) >= lsn
    return check


@pytest.fixture()
def feed(scratch):
    d = os.path.join(scratch, "binlog")
    generate_binlog(d, n_events=600, n_docs=80, n_files=2, seed=21,
                    p_malformed=0.0)
    lines = []
    for f in sorted(f for f in os.listdir(d) if f.endswith((".jsonl", ".txt"))):
        with open(os.path.join(d, f)) as fh:
            lines += [ln.rstrip("\n") for ln in fh if ln.strip()]
    oracle_state, _s, _st = replay_dir(d)
    return lines, oracle_state


def test_socket_replay_matches_oracle(spark, scratch, feed):
    """Envelope lines over TCP land the same state as the file replay."""
    lines, oracle_state = feed
    table = make_table(scratch)
    _run_socket_session(
        spark, table, os.path.join(scratch, "ckpt1"), lines,
        source_format="socket", writer_id="sock-1",
        converged=_offsets_reached(table, _max_lsn(lines)),
    )
    assert_state_equals_oracle(spark, table, oracle_state)


def test_socket_producer_resend_is_state_noop(spark, scratch, feed):
    """A producer that re-sends its whole log (new connection, new query,
    fresh ledger namespace) must not change table state: event-level
    idempotence comes from the LWW fold, not from the batch ledger."""
    lines, oracle_state = feed
    table = make_table(scratch)
    _run_socket_session(
        spark, table, os.path.join(scratch, "ckpt1"), lines,
        source_format="socket", writer_id="sock-1",
        converged=_offsets_reached(table, _max_lsn(lines)),
    )
    before = table_state(spark, table)

    # second session: fresh checkpoint restarts foreachBatch ids at 0 — a
    # fresh writer_id keeps the first session's ledger from swallowing it
    _run_socket_session(
        spark, table, os.path.join(scratch, "ckpt2"), lines,
        source_format="socket", writer_id="sock-2",
        converged=lambda: table.is_committed(0, "sock-2"),
        settle=3.0,
    )
    # the re-send was APPLIED (its batch 0 is in the sock-2 ledger) yet
    # changed nothing: re-applying the same (key, ts, lsn) payloads is a
    # state no-op under the LWW fold
    assert table.is_committed(0, "sock-2")
    assert table_state(spark, table) == before
    assert_state_equals_oracle(spark, table, oracle_state)


def test_socket_debezium_matches_file_replay(spark, scratch, feed):
    """Standard Debezium envelopes over TCP: same state as the internal
    envelope replay of the same logical events."""
    lines, oracle_state = feed
    deb_lines = [_deb_line(json.loads(ln)) for ln in lines]
    table = make_table(scratch)
    _run_socket_session(
        spark, table, os.path.join(scratch, "ckpt1"), deb_lines,
        source_format="socket-debezium", writer_id="sock-deb-1",
        converged=_offsets_reached(table, _max_lsn(deb_lines)),
    )
    assert_state_equals_oracle(spark, table, oracle_state)
