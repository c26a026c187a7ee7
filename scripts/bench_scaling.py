"""Two-parallelism-level scaling benchmark (BASELINE.json north_rule).

The rule's criterion — ≥0.8 throughput scaling efficiency from N to 4N
executors — cannot use a real cluster in this sandbox, so we evidence it the
prescribed way: the SAME job (two-phase HLL sketch-build over the same
generated transcripts input) at ``local[8]`` and ``local[32]``, reporting
rows/sec at both plus efficiency = (T_8 / T_32) / (32 / 8).

Each level runs in its own subprocess (fresh JVM — no config bleed), does a
full-width warm-up pass (Python worker pool startup is amortized on a real
long-running cluster), then reports the best of ``--reps`` timed runs.

Usage: python scripts/bench_scaling.py [--turns 4000000] [--reps 3]
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, sys, time
sys.path.insert(0, {repo!r})
from hyperloglog_spark.engine.session import get_spark
from hyperloglog_spark import transcripts as tq

cores = {cores}
spark = get_spark("scaling", master=f"local[{{cores}}]", shuffle_partitions=cores)
trans = tq.load(spark, {path!r})
n = trans.count()
tq.distinct_conversations(trans).collect()          # warm-up, full width
best = float("inf")
for _ in range({reps}):
    t0 = time.perf_counter()
    rows = tq.distinct_conversations(trans).collect()
    best = min(best, time.perf_counter() - t0)
est = rows[0][0]
print(json.dumps({{"cores": cores, "n_turns": n, "best_sec": best,
                   "rows_per_sec": n / best, "estimate": est}}))
spark.stop()
"""


def run_level(cores: int, path: str, reps: int) -> dict:
    src = _CHILD.format(repo=REPO, cores=cores, path=path, reps=reps)
    out = subprocess.run(
        [sys.executable, "-c", src], capture_output=True, text=True,
        timeout=1200, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=4_000_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from bench import transcripts_path, TURNS_PER_SF

    path = transcripts_path(args.turns / TURNS_PER_SF)

    lo = run_level(8, path, args.reps)
    hi = run_level(32, path, args.reps)
    assert lo["estimate"] == hi["estimate"], (
        "estimate must be parallelism-independent")

    speedup = lo["best_sec"] / hi["best_sec"]
    eff = speedup / (32 / 8)
    result = {
        "job": "hll_distinct_conv_id two-phase sketch build",
        "n_turns": lo["n_turns"],
        "local8": {"sec": round(lo["best_sec"], 3),
                   "rows_per_sec": int(lo["rows_per_sec"])},
        "local32": {"sec": round(hi["best_sec"], 3),
                    "rows_per_sec": int(hi["rows_per_sec"])},
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "estimate": lo["estimate"],
    }

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(f"""# Scaling evidence (N -> 4N cores)

North-rule criterion: throughput scaling efficiency >= 0.8 between cluster
sizes N and 4N. Sandbox evidence (no real cluster): the same two-phase HLL
sketch-build job over the same deterministic transcripts input
({result["n_turns"]:,} turns, Zipf(1.2)-skewed conv_id) at `local[8]` vs
`local[32]`, best of {args.reps} timed runs after a full-width warm-up.

| parallelism | wall (s) | turns/sec |
|---|---|---|
| local[8]  (N)  | {result["local8"]["sec"]} | {result["local8"]["rows_per_sec"]:,} |
| local[32] (4N) | {result["local32"]["sec"]} | {result["local32"]["rows_per_sec"]:,} |

**Speedup 8->32:** {result["speedup_8_to_32"]}x of a possible 4x
**Scaling efficiency:** {result["scaling_efficiency"]} (target >= 0.8)

Estimate is bit-identical at both levels ({result["estimate"]:,}) — the
register-max merge is associative/commutative, so partitioning cannot change
the result.

Why this scales: phase 1 is embarrassingly parallel (per-partition numpy
register builds, zero cross-partition traffic); the only shuffle moves one
~16 KB sketch row per partition; the serial tail is a driver-side merge of
#partitions sketches (microseconds). See SURVEY.md §4.3.

Reproduce: `python scripts/bench_scaling.py`
""")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
