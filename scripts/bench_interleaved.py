"""Interleaved cross-round suite benchmark (VERDICT r2 #2).

The per-round `bench.py` numbers at sf0.1 sit inside this shared host's
3-4x co-tenant noise, so a round-over-round wall comparison from two
separate sessions (r01: 16.9 s, r02 common set: 20.2 s) cannot distinguish
regression from noise. This harness settles it the way BENCH/CLUSTER.md
settles cluster numbers: run BOTH code versions INTERLEAVED in one session
(A, B, A, B, ...) so both sample the same noise windows, take per-query
minima per side across rounds, and compare only queries present in both.

Mechanics: the old code runs from a git worktree (checked out under
.bench_cache/, never committed) with the main repo's .bench_cache
symlinked in so both sides read the identical cached transcripts input.
Each (side, round) is a fresh subprocess running that side's bench.py.

Usage: python scripts/bench_interleaved.py [--baseline a80ad17]
                                           [--rounds 3] [--sf-dir ...]
Appends raw runs to BENCH/interleaved_runs.jsonl, writes
BENCH/INTERLEAVED.md, prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".bench_cache")


def _worktree(commit: str) -> str:
    path = os.path.join(CACHE, f"worktree_{commit}")
    if not os.path.exists(os.path.join(path, "bench.py")):
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, commit],
            cwd=REPO, check=True, capture_output=True,
        )
    # share the transcripts/shard cache so both sides read identical input
    link = os.path.join(path, ".bench_cache")
    if not os.path.exists(link):
        os.symlink(CACHE, link)
    return path


def _run_bench(repo_dir: str, sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(repo_dir, "bench.py")],
        cwd=repo_dir, env=env, capture_output=True, text=True,
        timeout=1800, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", default="a80ad17",
                    help="git rev of the previous round's code")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="",
                    help="suffix for the runs log and report (e.g. 'sf1' "
                         "-> interleaved_runs_sf1.jsonl + "
                         "INTERLEAVED_SF1.md), keeping scales separate")
    ap.add_argument("--report-only", action="store_true")
    args = ap.parse_args()

    suffix = f"_{args.tag}" if args.tag else ""
    runs_log = os.path.join(REPO, "BENCH", f"interleaved_runs{suffix}.jsonl")
    os.makedirs(os.path.dirname(runs_log), exist_ok=True)

    if not args.report_only:
        old_dir = _worktree(args.baseline)
        with open(runs_log, "a") as f:
            for rnd in range(args.rounds):
                for side, d in (("baseline", old_dir), ("head", REPO)):
                    r = _run_bench(d, args.sf_dir, args.cpus)
                    f.write(json.dumps({
                        "side": side, "round": rnd, "rev": args.baseline
                        if side == "baseline" else "HEAD",
                        "queries": r["queries"], "value": r["value"],
                        "turns_per_sec": r.get("turns_per_sec"),
                    }) + "\n")
                    print(f"round {rnd} {side}: {r['value']}s",
                          file=sys.stderr)

    best: dict[str, dict[str, float]] = {"baseline": {}, "head": {}}
    n_rounds = {"baseline": 0, "head": 0}
    with open(runs_log) as f:
        for line in f:
            rec = json.loads(line)
            side = rec["side"]
            n_rounds[side] += 1
            for q, s in rec["queries"].items():
                cur = best[side].get(q)
                best[side][q] = s if cur is None else min(cur, s)

    common = sorted(set(best["baseline"]) & set(best["head"]))
    rows = []
    for q in common:
        b, h = best["baseline"][q], best["head"][q]
        rows.append((q, b, h, round(h / b, 3)))
    tot_b = round(sum(r[1] for r in rows), 3)
    tot_h = round(sum(r[2] for r in rows), 3)

    md = [
        f"# Interleaved suite bench: previous round vs HEAD"
        + (f" ({args.tag})" if args.tag else ""),
        "",
        f"Same session, alternating sides ({n_rounds['baseline']} runs "
        f"each), per-query MIN per side — both sides sample the same "
        f"host-noise windows (the BENCH/CLUSTER.md policy). Common "
        f"queries only; baseline = `{args.baseline}`; "
        f"sf-dir = `{args.sf_dir}`.",
        "",
        "| query | baseline best (s) | HEAD best (s) | ratio |",
        "|---|---|---|---|",
    ]
    for q, b, h, ratio in rows:
        md.append(f"| {q} | {b} | {h} | {ratio} |")
    md += [
        f"| **common-set total** | **{tot_b}** | **{tot_h}** | "
        f"**{round(tot_h / tot_b, 3)}** |",
        "",
        "Ratio > 1 = HEAD slower. Under the interleaved-minima policy a "
        "uniform drift disappears if it was co-tenant noise; only "
        "per-query structural changes survive.",
        "",
        f"Reproduce: `python scripts/bench_interleaved.py"
        + (f" --tag {args.tag} --sf-dir {args.sf_dir}`" if args.tag
           else "`"),
    ]
    report = os.path.join(REPO, "BENCH", f"INTERLEAVED{suffix.upper()}.md")
    with open(report, "w") as f:
        f.write("\n".join(md) + "\n")

    print(json.dumps({
        "common_total_baseline": tot_b,
        "common_total_head": tot_h,
        "ratio": round(tot_h / tot_b, 3),
        "n_common": len(common),
        "per_query_ratio": {q: r for q, _, _, r in rows},
    }))


if __name__ == "__main__":
    main()
