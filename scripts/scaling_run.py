"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N).

No real cluster exists in this sandbox, so — per the task note — the same
job runs at two parallelism levels (local[8] vs local[32]) on the same
input; efficiency = (throughput_32 / throughput_8) / (32 / 8).

Each level runs in a FRESH subprocess (a SparkContext's core count is
fixed per JVM), bench.run() with the same sf_dir, repeated R times taking
the best (JIT/page-cache warmup noise). Results → BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _wait_for_quiet(max_wait: int = 240, threshold: float = 3.5) -> None:
    """The sandbox shares a host; external IO-wait spikes poison timing
    comparisons. Wait for 1-min loadavg to settle before each sample."""
    import time

    t0 = time.time()
    while time.time() - t0 < max_wait:
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
        if load1 < threshold:
            return
        time.sleep(15)


def _one(cpus: int, sf_dir: str) -> dict:
    _wait_for_quiet()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus),
             "SPARK_GRAFT_SF_DIR": sf_dir,
             # alternating best-of-N across subprocesses already handles
             # noise here; in-process repeats would double build time
             "BENCH_REPEATS": os.environ.get("BENCH_REPEATS", "1")},
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_levels(lo: int, hi: int, sf_dir: str, repeats: int = 3
               ) -> tuple[dict, dict]:
    """Alternating samples (lo, hi, lo, hi, ...) so ambient load affects
    both levels symmetrically; best-of-N per level."""
    best: dict[int, dict] = {}
    for _ in range(repeats):
        for cpus in (lo, hi):
            r = _one(cpus, sf_dir)
            if cpus not in best or r["value"] < best[cpus]["value"]:
                best[cpus] = r
    return best[lo], best[hi]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    levels = os.environ.get("SCALING_LEVELS", "8,32")
    repeats = int(os.environ.get("SCALING_REPEATS", "3"))
    out_name = os.environ.get("SCALING_OUT", "BENCH_SCALING.md")
    lo, hi = (int(x) for x in levels.split(","))
    r_lo, r_hi = run_levels(lo, hi, sf_dir, repeats=repeats)

    def eff(metric: str) -> tuple[float, float, float]:
        a, b = r_lo[metric], r_hi[metric]
        return a, b, (b / a) / (hi / lo)

    idx = eff("docs_per_sec_index_build")
    qry = eff("queries_per_sec_bmw")
    two = (eff("queries_per_sec_two_stage")
           if "queries_per_sec_two_stage" in r_lo else None)
    nq = r_lo.get("n_queries", 50)
    lines = [
        f"# BENCH_SCALING — N vs 4N parallelism (local[{lo}] vs "
        f"local[{hi}], sf_dir={sf_dir})",
        "",
        f"| metric | local[{lo}] | local[{hi}] | scaling efficiency |",
        "|---|---|---|---|",
        f"| index build (docs/sec) | {idx[0]:.1f} | {idx[1]:.1f} | "
        f"{idx[2]:.3f} |",
        f"| BMW query throughput (q/sec) | {qry[0]:.1f} | {qry[1]:.1f} | "
        f"{qry[2]:.3f} |",
    ] + ([
        f"| two-stage rank throughput @{nq}q (q/sec) | {two[0]:.1f} | "
        f"{two[1]:.1f} | {two[2]:.3f} |",
    ] if two else []) + [
        "",
        f"raw local[{lo}]: `{json.dumps(r_lo)}`",
        f"raw local[{hi}]: `{json.dumps(r_hi)}`",
        "",
        "Efficiency = (throughput_4N / throughput_N) / 4. North-rule "
        "target: >= 0.8 on the index-build metric.",
    ]
    with open(os.path.join(REPO, out_name), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
