"""Bench regression gate: compare a fresh bench JSON against the
per-query history in BENCH_r*.json and flag >1.5x regressions.

The box shows multi-second CPU-steal stalls, so the comparison
baseline per query is the MINIMUM across all prior rounds (the
cleanest observed run), and the verdict is advisory — meant to catch
real plan regressions (a lost broadcast, a new shuffle), not steal
noise on a single query.

Usage: python tools/bench_compare.py <new.json> [repo_dir]
       python bench.py | tail -1 > /tmp/b.json && python tools/bench_compare.py /tmp/b.json

Journal mode (VERDICT r10 item 8 — the like-for-like table the
verdicts kept recomputing by hand):

       python tools/bench_compare.py --journal [new.json]

reads the append-only commit-stamped ``BENCH_HISTORY.jsonl``, picks
the baseline automatically (the newest PRIOR journal record; if the
current run's commit already appears in the journal, the newest
record at a DIFFERENT commit, so a re-run compares box-to-box against
real code motion, not against itself), and prints shared-N, totals,
the like-for-like ratio, and every >1.25x outlier with
touching-commit attribution (``git log -S<name> base..cur``) so noise
(no touching commits) separates from regression (a named commit).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

THRESHOLD = 1.5
LFL_THRESHOLD = 1.25


def _journal_records(repo: str) -> list[dict]:
    out = []
    jpath = os.path.join(repo, "BENCH_HISTORY.jsonl")
    if os.path.exists(jpath):
        with open(jpath) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if rec.get("queries"):
                    out.append(rec)
    return out


def _touching_commits(repo: str, name: str, base: str, cur: str) -> list[str]:
    """Commits between base..cur whose diff mentions ``name`` (git
    pickaxe) — empty list reads as 'no touching commits: box noise'."""
    if not base or not cur or base == cur:
        return []
    try:
        r = subprocess.run(
            # pathspec limits the pickaxe to SOURCE: bench/correctness
            # artifacts contain every query name and would attribute
            # every outlier to the round-closing artifact commit
            # catalog.py excluded: it holds the window-priority name
            # list, so a pure rotation commit would false-positive as
            # "touching" every rotated query (registrations live in
            # the plans modules themselves)
            ["git", "log", "--oneline", f"-S{name}", f"{base}..{cur}",
             "--", "xero_api_etl_utilities_spark", "bench.py",
             "__spark_entry__.py",
             ":(exclude)xero_api_etl_utilities_spark/plans/catalog.py"],
            cwd=repo, capture_output=True, text=True, timeout=30,
        )
        return [ln for ln in r.stdout.strip().splitlines() if ln]
    except (OSError, subprocess.SubprocessError):
        return []


def _commit_band(records: list[dict], commit: str) -> str | None:
    """min/median/max of headline_total across ALL journal runs at one
    commit — the measured box-noise band.  The r11 close quoted two
    same-HEAD points (250.8s and 284.8s) that looked contradictory;
    the band is the honest statistic (VERDICT r11 item 3): a delta is
    a regression only when it leaves this envelope."""
    import statistics

    totals = sorted(
        float(r["headline_total"])
        for r in records
        if r.get("commit") == commit
        and isinstance(r.get("headline_total"), (int, float))
    )
    if not totals:
        return None
    med = statistics.median(totals)
    spread = (totals[-1] - totals[0]) / med * 100 if med else 0.0
    return (
        f"band {commit}: n={len(totals)} min={totals[0]:.1f}s "
        f"median={med:.1f}s max={totals[-1]:.1f}s (spread {spread:.0f}%)"
    )


def print_bands(repo: str, commits: list[str]) -> int:
    """--band [commit ...]: per-commit headline bands from the journal
    (no args: every commit with >= 2 recorded runs, newest last)."""
    records = _journal_records(repo)
    if not commits:
        seen: list[str] = []
        for rec in records:
            c = rec.get("commit")
            if c and c not in seen:
                seen.append(c)
        commits = [
            c
            for c in seen
            if sum(1 for r in records if r.get("commit") == c) >= 2
        ]
        if not commits:
            print("no commit has >= 2 journal runs yet")
            return 0
    for c in commits:
        print(_commit_band(records, c) or f"band {c}: no journal runs")
    return 0


def journal_compare(repo: str, new_path: str | None) -> int:
    records = _journal_records(repo)
    if new_path:
        with open(new_path) as f:
            raw = json.load(f)
        cur = {
            "queries": raw.get("queries")
            or (raw.get("parsed") or {}).get("queries")
            or {},
            "commit": raw.get("commit", ""),
            "headline_total": raw.get("headline_total")
            or raw.get("value"),
        }
    elif records:
        cur = records.pop()
    else:
        print("journal empty and no new.json given")
        return 0
    cur_commit = cur.get("commit", "")
    # newest prior record at a different commit (same-commit re-runs
    # prove box noise, not code motion)
    base = None
    for rec in reversed(records):
        if rec.get("commit") and rec["commit"] != cur_commit:
            base = rec
            break
    if base is None and records:
        base = records[-1]
    if base is None:
        print("no prior journal record to compare against")
        return 0

    bq, cq = base["queries"], cur["queries"]
    shared = sorted(set(bq) & set(cq))
    tot_b = sum(float(bq[q]) for q in shared)
    tot_c = sum(float(cq[q]) for q in shared)
    print(
        f"like-for-like vs commit {base.get('commit', '?')} "
        f"(current {cur_commit or '?'}): shared {len(shared)} entries"
    )
    print(
        f"  totals {tot_b:.1f}s -> {tot_c:.1f}s  "
        f"ratio {tot_c / tot_b:.3f}x" if tot_b else "  empty baseline"
    )
    only_b = sorted(set(bq) - set(cq))
    only_c = sorted(set(cq) - set(bq))
    if only_c:
        print(f"  new entries ({len(only_c)}): {', '.join(only_c)}")
    if only_b:
        print(f"  dropped entries ({len(only_b)}): {', '.join(only_b)}")

    # same-commit noise bands for both ends (when the journal has
    # multiple runs): quote THESE in closing artifacts, not one point
    for label, c in (("current", cur_commit), ("baseline", base.get("commit", ""))):
        band = _commit_band(records + [cur], c) if c else None
        if band:
            print(f"  {label} {band}")

    outliers = [
        (q, float(bq[q]), float(cq[q]))
        for q in shared
        if float(bq[q]) > 0 and float(cq[q]) > LFL_THRESHOLD * float(bq[q])
    ]
    print(f"  >{LFL_THRESHOLD}x outliers: {len(outliers)}")
    for q, b, c in sorted(outliers, key=lambda x: -(x[2] / x[1])):
        touching = _touching_commits(repo, q, base.get("commit", ""), cur_commit)
        attr = (
            "; ".join(touching[:3])
            if touching
            else "no touching commits (box noise)"
        )
        print(f"    {q}: {b:.2f}s -> {c:.2f}s ({c / b:.2f}x) — {attr}")
    return 0


def main() -> int:
    repo_default = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = [a for a in sys.argv[1:] if a not in ("--journal", "--band")]
    if "--band" in sys.argv[1:]:
        return print_bands(repo_default, args)
    if "--journal" in sys.argv[1:]:
        return journal_compare(repo_default, args[0] if args else None)
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
