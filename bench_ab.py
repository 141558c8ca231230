"""A/B bench: same-session, interleaved CoW replay at two commits.

VERDICT r2 flagged a possible regression on the headline CoW replay
(r1 608.8k ev/s vs r2 552.4k) but the two numbers were taken hours apart
on a host with minute-scale tenancy noise (vCPU steal), so they are not
comparable. This harness pins it: it checks out commit A into a git
worktree, then runs the replay-only bench (BENCH_COW_ONLY +
BENCH_QUERIES_SKIP; each run's number is already best-of-BENCH_REPEAT warm
repeats in one JVM) alternately A,B,A,B,... in ONE session so host noise
hits both arms equally, and reports per-arm median + best with every
per-round wall, plus the median delta.

Usage: python bench_ab.py <commitA> [commitB] [rounds]
       commitB defaults to '.' = the current working tree (HEAD +
       uncommitted changes). rounds defaults to 4.
Writes BENCH/AB_cow.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def _checkout(commit: str) -> str:
    """Materialize `commit` as a git worktree under .ab/ and share the
    binlog cache (the cache key is content-deterministic and identical
    across the commits under test)."""
    if commit == ".":
        return REPO
    sha = subprocess.check_output(
        ["git", "rev-parse", "--short", commit], cwd=REPO, text=True
    ).strip()
    d = os.path.join(REPO, ".ab", sha)
    if not os.path.isdir(d):
        subprocess.run(
            ["git", "worktree", "add", "--force", d, sha],
            cwd=REPO, check=True, capture_output=True,
        )
    cache = os.path.join(d, ".bench")
    if not os.path.islink(cache) and not os.path.isdir(cache):
        os.symlink(os.path.join(REPO, ".bench"), cache)
    return d


def _run(repo_dir: str) -> dict:
    env = dict(os.environ)
    # AB_TEXT_ONLY=1 restores the original text-CoW-only arms; the default
    # (round-5 verdict task 2) runs the full replay trio per arm so the
    # text AND columnar paths are A/B'd in the same interleaved session.
    if os.environ.get("AB_TEXT_ONLY"):
        env["BENCH_COW_ONLY"] = "1"   # no-op at commits that predate the flag
    env["BENCH_QUERIES_SKIP"] = "1"
    env.setdefault("BENCH_REPEAT", "3")
    out = subprocess.run(
        [sys.executable, os.path.join(repo_dir, "bench.py")],
        capture_output=True, text=True, env=env, cwd=repo_dir, timeout=3600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(
            f"bench.py in {repo_dir} produced no JSON (rc={out.returncode});"
            " stderr tail:\n" + "\n".join(out.stderr.splitlines()[-15:]) + "\n"
        )
        raise RuntimeError(f"bench run failed in {repo_dir}")
    return json.loads(lines[-1])


def main() -> None:
    a = sys.argv[1]
    b = sys.argv[2] if len(sys.argv) > 2 else "."
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    dir_a, dir_b = _checkout(a), _checkout(b)

    paths = ["text"] if os.environ.get("AB_TEXT_ONLY") else ["text", "columnar"]
    walls: dict[str, dict[str, list[float]]] = {
        p: {a: [], b: []} for p in paths
    }
    for r in range(rounds):
        for name, d in ((a, dir_a), (b, dir_b)):
            res = _run(d)
            walls["text"][name].append(res["value"])
            msg = f"round {r} {name}: text {res['value']}s"
            if "columnar" in walls:
                col = res.get("replay_columnar_sec")
                if col is None:
                    raise RuntimeError(
                        f"arm {name} reported no columnar wall; rerun with "
                        "AB_TEXT_ONLY=1 for commits that predate it"
                    )
                walls["columnar"][name].append(col)
                msg += f", columnar {col}s"
            print(msg, file=sys.stderr)

    events = int(os.environ.get("BENCH_EVENTS", "6000000"))

    def stats(w: list[float]) -> dict:
        med = statistics.median(w)
        return {
            "walls_sec": w,
            "median_sec": round(med, 3),
            "best_sec": round(min(w), 3),
            "median_ev_s": round(events / med, 1),
            "best_ev_s": round(events / min(w), 1),
        }

    result: dict[str, dict] = {"a": a, "b": b, "rounds": rounds}
    tables = []
    for p in paths:
        sa, sb = stats(walls[p][a]), stats(walls[p][b])
        delta_pct = round(
            100.0 * (sb["median_ev_s"] - sa["median_ev_s"])
            / sa["median_ev_s"], 2
        )
        verdict = (
            "B >= A (no regression)" if delta_pct >= -2.0
            else f"B is {-delta_pct}% slower than A (regression)"
        )
        result[p] = {"a_stats": sa, "b_stats": sb,
                     "median_delta_pct": delta_pct, "verdict": verdict}
        tables.append(f"""## {p} path

| arm | commit | walls (s) | median s | best s | median ev/s | best ev/s |
|---|---|---|---|---|---|---|
| A | `{a}` | {sa['walls_sec']} | {sa['median_sec']} | {sa['best_sec']} | {sa['median_ev_s']:,} | {sa['best_ev_s']:,} |
| B | `{b}` | {sb['walls_sec']} | {sb['median_sec']} | {sb['best_sec']} | {sb['median_ev_s']:,} | {sb['best_ev_s']:,} |

**Median throughput delta (B vs A): {delta_pct:+}% — {verdict}**
""")

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "AB_cow.md"), "w") as f:
        f.write(f"""# BENCH/AB_cow.md — interleaved A/B, replay headline

Generated {time.strftime('%Y-%m-%d %H:%M:%S')} by bench_ab.py.
Arms alternate A,B,A,B,... in one session ({rounds} rounds), so host-tenancy
noise hits both equally; each wall is already best-of-{os.environ.get('BENCH_REPEAT', '3')}
warm in-JVM repeats of the full {events:,}-event replay.

""" + "\n".join(tables))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
