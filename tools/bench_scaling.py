"""Scaling-efficiency evidence: run bench.py at two parallelism levels
(local[8] = N, local[32] = 4N cores) on identical input and report
throughput at both plus ``efficiency = throughput_4N / (4 × throughput_N)``.

This is the sandbox stand-in for the north rule's two-cluster-size
criterion (no real cluster available; see BASELINE.md "Sandbox evidence
plan").  Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, n_turns: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_TURNS=str(n_turns),
        SPARK_GRAFT_SF_DIR=sf_dir,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_turns = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "4000000"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo, hi = 8, 32

    r_lo = run_at(lo, n_turns, sf_dir)
    r_hi = run_at(hi, n_turns, sf_dir)
    t_lo = r_lo["throughput_turns_per_sec"]
    t_hi = r_hi["throughput_turns_per_sec"]
    eff = t_hi / (4 * t_lo)

    md = f"""# BENCH/BASELINE — scaling-efficiency evidence

North-rule criterion: throughput scaling efficiency >= 0.8 between cluster
sizes N and 4N.  Sandbox evidence (no real cluster): the identical
parse->enrich->route->aggregate job on identical input
({n_turns:,} synthetic transcript turns, 10% of rows in 5 hot
conversations) at two parallelism levels.

| parallelism | e2e wall (s) | throughput (turns/s) |
|---|---|---|
| local[{lo}]  (N)  | {r_lo['value']:.2f} | {t_lo:,.0f} |
| local[{hi}] (4N) | {r_hi['value']:.2f} | {t_hi:,.0f} |

**efficiency = throughput_4N / (4 x throughput_N) = {eff:.3f}**

Per-query seconds at each level:

| query | local[{lo}] | local[{hi}] |
|---|---|---|
"""
    for k in r_lo["queries"]:
        md += f"| {k} | {r_lo['queries'][k]} | {r_hi['queries'].get(k, '-')} |\n"
    md += f"""
Raw JSON:

```
{json.dumps(r_lo)}
{json.dumps(r_hi)}
```
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)
    print(f"EFFICIENCY {eff:.3f} ({'PASS' if eff >= 0.8 else 'BELOW TARGET'})")


if __name__ == "__main__":
    main()
