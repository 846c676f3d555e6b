"""Scaling capture for the end-to-end transcript dataprep job
(jobs/run_transcript_dataprep.py): run the SAME input at N and 4N
cores in fresh JVMs, interleaved ABAB (bench.py's noise discipline —
a noise burst degrades one leg of each level, never every run of one
level), and report throughput at both plus scaling efficiency — the
sandbox stand-in for the north rule's two-cluster-size criterion,
applied to the full capstone pipeline (integrity gate → render →
curate → split → tokenize+pack) rather than the parse chain.

    python tools/dataprep_scaling.py [n_turns] [n_cores]

Prints one JSON line. Timing is the job's own post-startup wall
(summary.json wall_s), so constant JVM boot doesn't bias the ratio.
Don't run other Spark jobs concurrently.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 9_600_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_legs = int(os.environ.get("SPARK_GRAFT_SCALING_LEGS", "3"))

    scratch = tempfile.mkdtemp(prefix="dataprep_scaling_")
    turns_dir = os.path.join(scratch, "turns")

    # generate the shared input once (its own JVM; not timed)
    gen_code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from logshipper_spark.session import get_spark\n"
        "from logshipper_spark import gen\n"
        "spark = get_spark(app_name='dataprep-scaling-gen')\n"
        "gen.transcripts(spark, %d).write.mode('overwrite').parquet(%r)\n"
        % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
           n_turns, turns_dir)
    )
    subprocess.run([sys.executable, "-c", gen_code], check=True,
                   capture_output=True, text=True)

    job = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "jobs", "run_transcript_dataprep.py",
    )
    legs = [c for _ in range(n_legs) for c in (n, 4 * n)]
    per_level: dict[int, list[float]] = {n: [], 4 * n: []}
    for i, cores in enumerate(legs):
        out = os.path.join(scratch, f"out_{i}")
        # SAME 8g heap at both levels: session.py's measured guidance —
        # large heaps pay growth + GC-pause tax on this VM. A 32g heap
        # at the 32-core level measured the whole job 2.1x slower
        # (92.7 s vs 43.4 s at 2.4M turns, curate stage 48 s vs 8.7 s);
        # equal heaps also keep the levels comparable.
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cores),
            SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        )
        subprocess.run(
            [sys.executable, job, "--turns", turns_dir, "--out", out,
             "--require-ok", "--split", "train:0.98,val:0.01,test:0.01",
             "--budget", "2048", "--vocab-size", "50000"],
            env=env, check=True, capture_output=True, text=True,
        )
        with open(os.path.join(out, "summary.json")) as f:
            s = json.load(f)
        wall = s["wall_s"]
        per_level[cores].append(round(n_turns / wall, 1))
        print(f"# leg {i}: {cores} cores, {wall} s, "
              f"{per_level[cores][-1]:,.0f} turns/s, stages {s['stage_s']}",
              file=sys.stderr)
        shutil.rmtree(out, ignore_errors=True)
    tp_n = max(per_level[n])
    tp_4n = max(per_level[4 * n])
    print(json.dumps({
        "metric": "dataprep_scaling_efficiency_Nx4",
        "value": round(tp_4n / tp_n / 4.0, 3),
        "unit": "ratio",
        "n_turns": n_turns,
        "throughput_turns_per_sec": {
            f"{n}_cores": tp_n, f"{4 * n}_cores": tp_4n,
        },
        "per_leg_turns_per_sec": {
            f"{n}_cores": per_level[n], f"{4 * n}_cores": per_level[4 * n],
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
