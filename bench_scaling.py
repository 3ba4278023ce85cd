#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north_rule: throughput scaling
efficiency >= 0.8 between N and 4N executors).

No multi-node cluster exists in this sandbox; per the driver instruction the
proxy is the SAME spark-submit --py-files job at local[8] and local[32] on
identical input. Efficiency = (throughput_32 / throughput_8) / 4. Results
land in BENCH/BASELINE.md and are printed as one JSON line.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def build_pyfiles_zip(path: str) -> str:
    with zipfile.ZipFile(path, "w") as z:
        pkg = os.path.join(REPO, "jsonschema_infer_spark")
        for root, _, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return path


def run(master: str, data: str, out: str, mem: str) -> dict:
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(shutil.which("pyspark") or "/usr/local/bin/pyspark"),
        "spark-submit",
    )
    zip_path = build_pyfiles_zip(os.path.join(REPO, ".cache", "jis_pyfiles.zip"))
    cmd = [
        spark_submit,
        "--master", master,
        "--driver-memory", mem,
        "--py-files", zip_path,
        os.path.join(REPO, "bench", "pipeline_job.py"),
        "--data", data,
        "--out", out,
        "--shuffle-partitions", "64",
    ]
    env = dict(os.environ)
    subprocess.run(cmd, check=True, env=env, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    with open(out) as f:
        return json.load(f)


def main():
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "1700000"))
    mem = os.environ.get("SPARK_GRAFT_MEM", "48g")
    from bench import ensure_bench_transcripts

    data = ensure_bench_transcripts(n_convs)

    os.makedirs(os.path.join(REPO, ".cache"), exist_ok=True)
    r8 = run("local[8]", data, os.path.join(REPO, ".cache", "scale8.json"), mem)
    r32 = run("local[32]", data, os.path.join(REPO, ".cache", "scale32.json"), mem)

    eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / 4.0
    summary = {
        "metric": "turns/sec validated (inference + constraint eval)",
        "rows": r32["rows"],
        "local8_turns_per_sec": r8["turns_per_sec"],
        "local32_turns_per_sec": r32["turns_per_sec"],
        "local8_secs": r8["secs"],
        "local32_secs": r32["secs"],
        "scaling_efficiency": round(eff, 3),
        "target": ">= 0.8",
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    md = f"""## Scaling evidence (two parallelism levels, same input, same job)

Proxy for the N vs 4N executor-cluster rule (no real cluster in this
sandbox, per driver instruction): the identical `spark-submit --py-files`
job (`bench/pipeline_job.py` — inference + constraint compilation + full
validation suite over the seed-fixed synthetic transcript table) at
`local[8]` and `local[32]`.

| config | rows (turns) | wall sec | turns/sec |
|---|---|---|---|
| local[8]  | {r8['rows']:,} | {r8['secs']} | {r8['turns_per_sec']:,} |
| local[32] | {r32['rows']:,} | {r32['secs']} | {r32['turns_per_sec']:,} |

**Scaling efficiency** = (thr_32 / thr_8) / 4 = **{eff:.3f}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

Pipeline checks executed per run: row constraints ({r32['row_violations']}
violations found), uniqueness on (conv_id, turn_idx) ({r32['dup_keys']} dup
keys), dense turn-ordering ({r32['ordering_violations']} violating convs).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n" + md)


if __name__ == "__main__":
    main()
