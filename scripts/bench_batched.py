#!/usr/bin/env python3
"""Batched Bench driver: the record methodology for big-SF sweeps.

A single-JVM 265-query sweep accumulates heap/storage pressure that a
real cluster never sees (each Spark job gets fresh executors): the
measured gap at sf10 is ~1.7x — 3025 s one-JVM vs ~1800 s batched —
with the slowdown concentrated in the LATER queries of the sweep, not
any particular operator. So the honest per-query record runs the suite
in fresh-JVM batches (default 22 queries per JVM, sorted name order,
~15 s startup amortized per batch) and merges the per-batch JSON into
one record with the same shape Bench prints.

Usage:
    python3 scripts/bench_batched.py SF_DIR OUT.json NAMES_FROM.json [BATCH]

NAMES_FROM.json: any prior Bench record at any sf — its "queries" keys
define the name universe (SPARK_GRAFT_ONLY rejects unknown names, so a
stale list fails loudly, never silently skips).
"""
import json, os, subprocess, sys

sf_dir, out_path, names_from = sys.argv[1], sys.argv[2], sys.argv[3]
batch = int(sys.argv[4]) if len(sys.argv) > 4 else 22

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
names = sorted(json.load(open(names_from))["queries"].keys())

queries, qmax, errors = {}, {}, []
for i in range(0, len(names), batch):
    grp = names[i:i + batch]
    tmp = f"/tmp/bench_batch_{i:03d}.json"
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_ONLY=",".join(grp),
               SPARK_GRAFT_BENCH_OUT=tmp)
    r = subprocess.run(["bash", os.path.join(root, "scripts", "bench.sh")],
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                       env=env)
    if r.returncode != 0 or not os.path.exists(tmp):
        # a batch-level crash (OOM etc.) marks every query in it failed
        print(f"batch {i}: bench.sh rc={r.returncode}", file=sys.stderr)
        for q in grp:
            queries[q] = -1.0; qmax[q] = -1.0; errors.append(q)
        continue
    d = json.load(open(tmp))
    queries.update(d["queries"])
    qmax.update(d.get("queries_max", {}))
    errors.extend(d.get("errors", []))
    os.remove(tmp)
    done = sum(1 for v in queries.values() if v >= 0)
    print(f"batch {i // batch}: {len(grp)} queries, "
          f"{sum(v for v in d['queries'].values() if v >= 0):.1f} s "
          f"({done}/{len(names)} done)", flush=True)

total = sum(v for v in queries.values() if v >= 0)
rec = {"metric": "total", "value": total, "unit": "sec",
       "runs": int(os.environ.get("SPARK_GRAFT_RUNS", "3")),
       "stat": "min", "method": f"batched fresh JVMs ({batch}/JVM)",
       "queries": queries, "queries_max": qmax,
       "errors": errors, "sf": sf_dir}
json.dump(rec, open(out_path, "w"))
print(f"total {total:.1f} s, {len(queries)} queries, errors={errors}")
