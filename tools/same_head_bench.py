"""Same-HEAD drift band: run bench.py N times sequentially at the
CURRENT commit and merge a ``same_head_runs_r{N}`` section into
BENCH_DETAIL.json (r11 VERDICT task 2; r12 item 2 moved the band to
the round's FINAL commit — run this LAST, after the last source
change).

Usage: python tools/same_head_bench.py <round> [n_runs=3]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    rnd = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    head = (
        subprocess.check_output(["git", "rev-parse", "--short", "HEAD"], cwd=REPO)
        .decode()
        .strip()
    )
    runs = []
    for i in range(n):
        out = subprocess.check_output(
            [sys.executable, os.path.join(REPO, "bench.py")], cwd=REPO
        ).decode()
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        runs.append(json.loads(line))
        print(f"run {i + 1}/{n}: total {runs[-1]['value']} s", flush=True)
    totals = [r["value"] for r in runs]
    med = sorted(totals)[len(totals) // 2]
    per_query = {}
    for q in runs[0]["queries"]:
        vals = [r["queries"][q] for r in runs]
        m = sorted(vals)[len(vals) // 2]
        per_query[q] = {
            "runs": vals,
            "spread_pct": round(100.0 * (max(vals) - min(vals)) / m, 1) if m else None,
        }
    section = {
        "head": head,
        "what": (
            f"r12 VERDICT task 2: {n} sequential full bench.py runs at the "
            "round's FINAL commit on an otherwise idle box — the same-gauge "
            "drift band under round-over-round comparisons, measured where "
            "the round is benchmarked (r12's band was 5 commits early)"
        ),
        "totals_sec": totals,
        "median_sec": med,
        "spread_pct": round(100.0 * (max(totals) - min(totals)) / med, 2),
        "per_query": per_query,
    }
    dpath = os.path.join(REPO, "BENCH_DETAIL.json")
    detail = json.load(open(dpath))
    detail[f"same_head_runs_r{rnd}"] = section
    with open(dpath, "w") as fh:
        json.dump(detail, fh, indent=1)
    print(
        json.dumps(
            {
                "head": head,
                "totals_sec": totals,
                "spread_pct": section["spread_pct"],
                "w0": per_query.get("w0_partitioned_write"),
            }
        )
    )


if __name__ == "__main__":
    main()
