"""Zone-catalog preparation scale evidence (VERDICT r3 'Next round' #3):
prepare >= 1,000 WKB zones fully distributed and show prep time scaling
with parallelism (local[8] vs local[32], taskset-pinned like
scaling_bench.py — the prep is Python-worker-heavy, so the OS CPU budget
must match the advertised core count).

Writes BENCH/ZONEPREP.md. Usage: python tools/zoneprep_scale_bench.py
[n_zones] [runs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys, time
import numpy as np
sys.path.insert(0, "%(repo)s")
from pyspark.sql import SparkSession, functions as F
from libgeodesk_spark.geom.wkb import rings_to_wkb
from libgeodesk_spark.operators.zoneprep import prepared_zones_df

cpus = int(sys.argv[1]); n_zones = int(sys.argv[2])
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.ui.enabled", "false")
         .config("spark.local.dir", "/dev/shm/spark-zoneprep")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# deterministic mixed-size catalog: mostly parish-sized, a heavy tail of
# region-sized zones (the skew a real admin catalog has)
rng = np.random.default_rng(4)
rows = []
for i in range(n_zones):
    cx = int(rng.integers(-1_500_000_000, 1_500_000_000))
    cy = int(rng.integers(-1_000_000_000, 1_000_000_000))
    heavy = i %% 50 == 0
    r = int(rng.integers(2_000_000, 8_000_000)) if heavy \
        else int(rng.integers(100_000, 1_500_000))
    k = int(rng.integers(24, 96)) if heavy else int(rng.integers(6, 24))
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    rad = r * rng.uniform(0.6, 1.0, k)
    ring = np.stack([cx + (rad * np.cos(ang)).astype(np.int64),
                     cy + (rad * np.sin(ang)).astype(np.int64)], axis=1)
    ring = np.vstack([ring, ring[:1]])
    rows.append((f"z{i:05d}", bytearray(rings_to_wkb([ring], merc=True))))

df = spark.createDataFrame(rows, "zone_id string, wkb binary") \
    .persist()
df.count()
t0 = time.time()
out = prepared_zones_df(df, n_slices=cpus * 4).agg(
    F.count("*").alias("n"), F.sum("n_edges").alias("edges"),
    F.sum("n_inside").alias("inside"),
    F.sum("n_boundary").alias("boundary")).first()
dt = time.time() - t0
print(json.dumps({"cpus": cpus, "n_zones": out["n"], "sec": round(dt, 2),
                  "edges": out["edges"], "inside": out["inside"],
                  "boundary": out["boundary"],
                  "zones_per_sec": round(out["n"] / dt, 1)}))
""" % {"repo": REPO}
WORKER = "import json\n" + WORKER


def run_at(cpus: int, n_zones: int) -> dict:
    env = dict(os.environ)
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c",
           WORKER, str(cpus), str(n_zones)]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         check=True)
    line = [ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    n_zones = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    results = {}
    for cpus in (8, 32):
        rs = []
        for _ in range(runs):
            r = run_at(cpus, n_zones)
            rs.append(r)
            print(r, flush=True)
        rs.sort(key=lambda r: r["sec"])
        results[cpus] = rs[len(rs) // 2]
    t8, t32 = results[8]["sec"], results[32]["sec"]
    eff = (t8 / t32) / (32 / 8)
    md = f"""# Zone-catalog preparation — distributed scale evidence

`prepared_zones_df` (operators/zoneprep.py): one mapInPandas pass, WKB →
edges → exact INSIDE/BOUNDARY cover on executors; driver only assembles
broadcast artifacts. Catalog: {n_zones} zones (1-in-50 heavy region-sized,
rest parish-sized — admin-catalog skew), {results[32]['edges']} edges,
{results[32]['inside']} INSIDE / {results[32]['boundary']} BOUNDARY cover
cells. Median of {runs} runs per level, taskset-pinned.

| cores | wall (s) | zones/s |
|---|---|---|
| 8 | {t8} | {results[8]['zones_per_sec']} |
| 32 | {t32} | {results[32]['zones_per_sec']} |

**Scaling efficiency 8→32 cores: {eff:.2f}** (speedup {t8 / t32:.2f}× of
4×). The stage is embarrassingly parallel over zones; residual
inefficiency is session-fixed overhead (Arrow batch startup) and the
heavy-tail zones bounding the last partition — both shrink as the
catalog grows relative to them.

Raw: `{json.dumps(results)}`
"""
    with open(os.path.join(REPO, "BENCH", "ZONEPREP.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
