"""Scaling-efficiency evidence: run bench.py at local[8] and local[32]
(same input, same seed) and write BENCH/BASELINE.md.

The north rule's two-cluster-size criterion (N vs 4N executors, efficiency
>= 0.8) cannot use a real cluster in this sandbox; per the driver
instruction it is evidenced by the same job at two parallelism levels.

Usage: python tools/scaling_bench.py [sf_dir] [repl]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, sf_dir: str, repl: int) -> dict:
    """Run bench.py with BOTH the executor-thread count and the OS CPU
    budget set to ``cpus`` (taskset) — python UDF workers are extra
    processes beyond local[N]'s N threads, so without CPU pinning a
    "local[8]" job can consume ~16 cores and the N-vs-4N comparison is
    not a faithful stand-in for N vs 4N executors."""
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_REPL=str(repl))
    cmd = ["taskset", "-c", f"0-{cpus - 1}",
           sys.executable, os.path.join(REPO, "bench.py")]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         check=True)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    results = {}
    n_runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
    for cpus in (8, 32):
        t0 = time.time()
        best = None
        for _ in range(n_runs):
            r = run_at(cpus, sf_dir, repl)
            if best is None or r["value"] < best["value"]:
                # keep the fastest full run; per-query times from that run
                best = r
        results[cpus] = best
        print(f"local[{cpus}]: {best} ({time.time()-t0:.0f}s, best of {n_runs})",
              flush=True)

    r8, r32 = results[8], results[32]
    rows = []
    effs = {}
    for key in ("tile_reencode", "spatial_join_within", "tiling_pyramid",
                "knn_k50"):
        t8, t32 = r8["queries"][key], r32["queries"][key]
        base8 = r8["n_reencoded" if key == "tile_reencode" else "n_images"]
        base32 = r32["n_reencoded" if key == "tile_reencode" else "n_images"]
        ips8 = base8 / t8
        ips32 = base32 / t32
        eff = (ips32 / ips8) / 4.0
        effs[key] = eff
        rows.append((key, t8, t32, ips8, ips32, eff))
    total_eff = ((r32["n_images"] * 3 / r32["value"])
                 / (r8["n_images"] * 3 / r8["value"])) / 4.0

    md = [
        "# BENCH — scaling evidence (local[8] vs local[32])",
        "",
        "Methodology: this sandbox is a shared VM with high run-to-run",
        "variance; each parallelism level reports the fastest of several",
        "full runs (SPARK_GRAFT_SCALING_RUNS, default 3), each query the",
        "fastest of SPARK_GRAFT_BENCH_TRIALS=2 in-session trials.",
        "",
        f"Input: derived points at `{sf_dir}` × replication {repl} = "
        f"{r32['n_images']:,} images; identical input and seed at both "
        "parallelism levels. Efficiency = (throughput_4N / throughput_N) / 4.",
        "",
        "| query | T(8) s | T(32) s | images/s @8 | images/s @32 | efficiency |",
        "|---|---|---|---|---|---|",
    ]
    for key, t8, t32, ips8, ips32, eff in rows:
        md.append(f"| {key} | {t8:.2f} | {t32:.2f} | {ips8:,.0f} | "
                  f"{ips32:,.0f} | {eff:.2f} |")
    md += [
        f"| **all (wall)** | {r8['value']:.2f} | {r32['value']:.2f} | "
        f"{r8['n_images']*3/r8['value']:,.0f} | {r32['n_images']*3/r32['value']:,.0f} | "
        f"{total_eff:.2f} |",
        "",
        f"Raw local[8]:  `{json.dumps(r8)}`",
        "",
        f"Raw local[32]: `{json.dumps(r32)}`",
        "",
        "Caveats: single-JVM local mode shares one driver heap. Each level",
        "is CPU-pinned with taskset (JVM threads + python UDF workers share",
        "exactly N cores), the faithful sandbox stand-in for N vs 4N",
        "executors. Per-query efficiency is throughput-based; short",
        "queries (<1s) carry scheduling noise.",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out_path, "w") as f:
        f.write("\n".join(md) + "\n")
    print(f"wrote {out_path}; spatial join efficiency = "
          f"{effs['spatial_join_within']:.2f}")


if __name__ == "__main__":
    main()
