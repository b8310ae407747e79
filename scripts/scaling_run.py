"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N).

No real cluster exists in this sandbox, so — per the task note — the same
job runs at two parallelism levels (local[8] vs local[32]) on the same
input; efficiency = (throughput_32 / throughput_8) / (32 / 8).

Each level runs in a FRESH subprocess (a SparkContext's core count is
fixed per JVM), bench.run() with the same sf_dir, alternating levels and
taking the best (JIT/page-cache warmup noise). Results → BENCH_SCALING.md.

Sample validation: a pre-sample quiet-wait cannot rule out load landing
MID-sample, and long N-core samples are hit more often than short 4N
ones, biasing the ratio DOWN. Every sample therefore measures the
machine's busy CPU rate (/proc/stat, iowait counted as busy) during its
own window: a local[N] bench can't use much more than N cores itself,
so ``busy_cores > N + SELF_MARGIN`` means a genuine CPU intruder and
the sample is rejected and re-run (bounded attempts). Sub-CPU host
variability (co-tenant memory-bandwidth/cache pressure with zero
guest-visible signal — observed ±20% on identical code at loadavg 0,
steal 0) cannot be screened from inside the guest; alternating
best-of-N is the only defense, and recorded numbers carry that error
bar.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: cores above the bench's own parallelism level that we attribute to
#: the bench itself (driver/GC/shuffle threads) before declaring an
#: external CPU intruder.
SELF_MARGIN = float(os.environ.get("SCALING_SELF_MARGIN", "2.5"))


def _wait_for_quiet(max_wait: int = 240, threshold: float = 3.5) -> None:
    """The sandbox shares a host; external IO-wait spikes poison timing
    comparisons. Wait for 1-min loadavg to settle before each sample."""
    t0 = time.time()
    while time.time() - t0 < max_wait:
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
        if load1 < threshold:
            return
        time.sleep(15)


def _machine_busy_secs() -> float:
    """Whole-machine non-idle CPU seconds since boot (iowait counted as
    busy — external IO contention is a disturbance we screen for)."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    idle = vals[3]
    return (sum(vals) - idle) / os.sysconf("SC_CLK_TCK")


#: canary slowdown ratio vs the session's best canary above which a
#: sample window is declared disturbed (see _canary_secs).
CANARY_MAX_RATIO = float(os.environ.get("SCALING_CANARY_MAX", "1.3"))


def _canary_secs() -> float:
    """Fixed memory-bandwidth-bound workload (single-thread numpy GEMV
    over a cache-busting array), best of 3. Co-tenant memory-bandwidth /
    cache pressure is invisible to every guest CPU counter (busy-cores,
    loadavg, steal all read clean) yet was measured to stretch identical
    runs 2.2x on this sandbox (round-5 probes: 62.8-140.6 s for the same
    build). The canary runs the same fixed work before and after each
    sample; if either is > CANARY_MAX_RATIO x the session's best, the
    host was in a slow episode during (or right at the edges of) the
    sample window and the sample is rejected like a busy-cores hit."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((4096, 4096))  # 128 MB >> LLC
    x = rng.standard_normal(4096)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(64):  # 64 x 128 MB streamed ≈ 50 ms/trial
            x = a @ x
            x /= np.abs(x).max()
        best = min(best, time.perf_counter() - t0)
    return best


def _one(cpus: int, sf_dir: str) -> dict:
    _wait_for_quiet()
    canary0 = _canary_secs()
    t0 = time.time()
    busy0 = _machine_busy_secs()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus),
             "SPARK_GRAFT_SF_DIR": sf_dir,
             # alternating best-of-N across subprocesses already handles
             # noise here; in-process repeats would double build time
             "BENCH_REPEATS": os.environ.get("BENCH_REPEATS", "1")},
        capture_output=True, text=True, check=True,
    )
    wall = time.time() - t0
    r = json.loads(out.stdout.strip().splitlines()[-1])
    r["busy_cores"] = round((_machine_busy_secs() - busy0) / wall, 2)
    r["canary_secs"] = round(max(canary0, _canary_secs()), 3)
    return r


def run_levels(lo: int, hi: int, sf_dir: str, repeats: int = 3
               ) -> tuple[dict, dict]:
    """Alternating samples (lo, hi, lo, hi, ...) so ambient load affects
    both levels symmetrically; a sample whose window's machine busy-CPU
    rate exceeded its own parallelism level + SELF_MARGIN had a genuine
    CPU intruder and is rejected and retried (up to 2*repeats attempts
    per level); best-of-clean per level, falling back to best-of-all if
    a level never got a clean window."""
    samples: dict[int, list] = {lo: [], hi: []}
    cpu_clean_count = {lo: 0, hi: 0}
    attempts = {lo: 0, hi: 0}
    best_canary = [float("inf")]
    max_attempts = 2 * repeats
    while any(cpu_clean_count[c] < repeats and attempts[c] < max_attempts
              for c in (lo, hi)):
        for cpus in (lo, hi):
            if cpu_clean_count[cpus] >= repeats or \
                    attempts[cpus] >= max_attempts:
                continue
            attempts[cpus] += 1
            r = _one(cpus, sf_dir)
            best_canary[0] = min(best_canary[0], r["canary_secs"])
            cpu_ok = r["busy_cores"] <= cpus + SELF_MARGIN
            canary_now = r["canary_secs"] <= CANARY_MAX_RATIO * \
                best_canary[0]
            print(f"  sample local[{cpus}] attempt {attempts[cpus]}: "
                  f"{r['value']}s busy_cores={r['busy_cores']} "
                  f"canary={r['canary_secs']} "
                  f"{'CLEAN' if cpu_ok and canary_now else 'REJECTED'}"
                  f"{'' if cpu_ok else '(cpu)'}"
                  f"{'' if canary_now else '(canary)'}", flush=True)
            samples[cpus].append((cpu_ok, r))
            if cpu_ok:
                cpu_clean_count[cpus] += 1

    def pick(cpus: int) -> dict:
        """Best-of-clean with the canary judged POST-HOC against the
        whole session's best canary window (the first sample would
        otherwise trivially pass a self-relative check); fall back to
        best-of-cpu-clean, then best-of-all."""
        rs = samples[cpus]
        for pool in (
            [r for ok, r in rs if ok and r["canary_secs"] <=
             CANARY_MAX_RATIO * best_canary[0]],
            [r for ok, r in rs if ok],
            [r for _, r in rs],
        ):
            if pool:
                return min(pool, key=lambda r: r["value"])
        raise RuntimeError(f"no samples at local[{cpus}]")

    return pick(lo), pick(hi)


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
