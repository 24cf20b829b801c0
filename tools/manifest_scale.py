"""Manifest scale curve at high commit count (round 12, VERDICT r11 #2).

Drives a versioned table to 1,000+ commits and measures every metadata
walk's cost as a function of commit count:

- commit wall (does appending commit N get slower as N grows?)
- current_version (one directory listing)
- snapshot read resolution (read_versioned: ONE manifest read — the
  protocol writes a FULL manifest per commit, i.e. it checkpoints on
  every commit; there is no Delta-style log replay to accelerate)
- DESCRIBE HISTORY full walk (linear by definition: it reports every
  commit) vs LIMIT k (constant: reads only the k newest manifests)
- TIMESTAMP AS OF resolution for a recent timestamp (constant-ish:
  descending walk stops at the first qualifying manifest)
- RESTORE to a recent version (one manifest read + one CAS commit)
- versioned_orphans / vacuum (listing-bounded, manifest reads bounded
  by retention + tags, NOT by total commits)

Emits one JSON document (docs/MANIFEST_SCALE_r12.json) consumed by the
SCALE.md section. Usage:

    python tools/manifest_scale.py [--commits 1000] [--out docs/MANIFEST_SCALE_r12.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = None


def _timed(fn, *a, **kw):
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    return out, time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", type=int, default=1000)
    ap.add_argument("--out", default="docs/MANIFEST_SCALE_r12.json")
    args = ap.parse_args()

    from us_stock_data_pipeline_spark.etl import versioned as V
    from us_stock_data_pipeline_spark.session import get_spark

    spark = get_spark("manifest-scale")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix=f"us_sdps_mscale_{uuid.uuid4().hex[:8]}_")
    result: dict = {"commits_target": args.commits, "checkpoints": []}
    probe_at = sorted({10, 100, 300, args.commits})
    try:
        df = spark.createDataFrame(
            [(i, i % 2, i * 3) for i in range(8)], "k long, band long, val long"
        )
        commit_walls: list[float] = []
        t_all = time.perf_counter()
        for n in range(1, args.commits + 1):
            upd = df.withColumn("val", df.val + n)
            _, dt = _timed(
                V.versioned_merge_upsert,
                spark,
                upd,
                root,
                key_cols=("k",),
                partition_cols=("band",),
            )
            commit_walls.append(dt)
            if n in probe_at:
                cur, t_cur = _timed(V.current_version, spark, root)
                snap, t_plan = _timed(V.read_versioned, spark, root)
                _, t_count = _timed(snap.count)
                hist, t_hist_full = _timed(
                    lambda: V.versioned_history(spark, root).collect()
                )
                _, t_hist_lim = _timed(
                    lambda: V.versioned_history(spark, root, limit=5).collect()
                )
                recent_ts = V._read_manifest_doc(spark, root, cur)["committed_at"]
                _, t_ts = _timed(V.resolve_timestamp, spark, root, recent_ts)
                result["checkpoints"].append(
                    {
                        "commits": n,
                        "current_version_sec": round(t_cur, 4),
                        "read_versioned_plan_sec": round(t_plan, 4),
                        "snapshot_count_sec": round(t_count, 4),
                        "history_full_sec": round(t_hist_full, 4),
                        "history_full_rows": len(hist),
                        "history_limit5_sec": round(t_hist_lim, 4),
                        "resolve_timestamp_sec": round(t_ts, 4),
                        "commit_wall_last10_avg_sec": round(
                            sum(commit_walls[-10:]) / len(commit_walls[-10:]), 4
                        ),
                    }
                )
                print(json.dumps(result["checkpoints"][-1]))
        result["total_commit_sec"] = round(time.perf_counter() - t_all, 2)
        result["commit_wall_first10_avg_sec"] = round(
            sum(commit_walls[:10]) / 10, 4
        )
        result["commit_wall_last10_avg_sec"] = round(
            sum(commit_walls[-10:]) / 10, 4
        )
        # restore to a recent version (constant: one manifest read + CAS)
        _, t_restore = _timed(
            V.restore_version, spark, root, V.current_version(spark, root) - 3
        )
        result["restore_recent_sec"] = round(t_restore, 4)
        # orphan audit + vacuum at full history
        orph, t_orph = _timed(
            V.versioned_orphans, spark, root, keep_last=2
        )
        result["orphans_sec"] = round(t_orph, 4)
        result["orphan_version_dirs"] = len(orph["orphan_version_dirs"])
        _, t_vac = _timed(
            V.vacuum_versions, spark, root, keep_last=2, grace_seconds=0.0
        )
        result["vacuum_sec"] = round(t_vac, 4)
        # post-vacuum: the steady-state costs with retention applied
        _, t_cur2 = _timed(V.current_version, spark, root)
        snap2, t_plan2 = _timed(V.read_versioned, spark, root)
        _, t_count2 = _timed(snap2.count)
        result["post_vacuum"] = {
            "current_version_sec": round(t_cur2, 4),
            "read_versioned_plan_sec": round(t_plan2, 4),
            "snapshot_count_sec": round(t_count2, 4),
        }
        # manifest byte sizes: the full-manifest-per-commit write cost
        mdir = root + "/manifests"
        sizes = [
            os.path.getsize(os.path.join(mdir, f))
            for f in os.listdir(mdir)
            if f.endswith(".json")
        ]
        result["manifest_bytes_each"] = int(sum(sizes) / max(1, len(sizes)))
        result["manifests_retained_after_vacuum"] = len(sizes)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "checkpoints"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
