"""Bench regression gate: compare a fresh bench JSON against the
per-query history in BENCH_r*.json and flag >1.5x regressions.

The box shows multi-second CPU-steal stalls, so the comparison
baseline per query is the MINIMUM across all prior rounds (the
cleanest observed run), and the verdict is advisory — meant to catch
real plan regressions (a lost broadcast, a new shuffle), not steal
noise on a single query.

Usage: python tools/bench_compare.py <new.json> [repo_dir]
       python bench.py | tail -1 > /tmp/b.json && python tools/bench_compare.py /tmp/b.json
"""

from __future__ import annotations

import glob
import json
import os
import sys

THRESHOLD = 1.5


def main() -> int:
    repo_default = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    new_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(repo_default, "BENCH_DETAIL.json")
    )
    repo = sys.argv[2] if len(sys.argv) > 2 else repo_default
    with open(new_path) as f:
        new = json.load(f)

    history: dict[str, float] = {}
    rounds = sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")))
    for path in rounds:
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        # the driver wraps bench's JSON line under "parsed"
        queries = data.get("queries") or (data.get("parsed") or {}).get("queries") or {}
        for q, sec in queries.items():
            if isinstance(sec, (int, float)):
                history[q] = min(history.get(q, float("inf")), float(sec))
    # the append-only commit-stamped journal (r10): every full run ever
    # recorded, immune to in-place BENCH_DETAIL.json overwrites
    jpath = os.path.join(repo, "BENCH_HISTORY.jsonl")
    if os.path.exists(jpath):
        with open(jpath) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                for q, sec in (rec.get("queries") or {}).items():
                    if isinstance(sec, (int, float)):
                        history[q] = min(history.get(q, float("inf")), float(sec))

    if not history:
        print("no BENCH_r*.json history; nothing to compare")
        return 0

    regressions, improved, new_queries = [], 0, []
    for q, sec in (new.get("queries") or {}).items():
        base = history.get(q)
        if base is None:
            new_queries.append(q)
        elif sec > THRESHOLD * base:
            regressions.append((q, base, sec))
        elif sec < base:
            improved += 1
    for q, base, sec in sorted(regressions, key=lambda x: -x[2] / x[1]):
        print(f"REGRESSION {q}: {sec:.2f}s vs best {base:.2f}s ({sec/base:.1f}x)")
    print(
        f"\n{len(regressions)} regressions > {THRESHOLD}x, {improved} improved, "
        f"{len(new_queries)} new queries, vs {len(rounds)} prior rounds"
    )
    if new_queries:
        print(f"new: {', '.join(sorted(new_queries))}")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
