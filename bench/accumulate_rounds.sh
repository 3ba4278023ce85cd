#!/bin/bash
# Unattended paired-round accumulator for the scaling-evidence claim.
# Waits for a truly healthy host window (the long degraded windows on this
# VM outlast bench_scaling's internal 30-min cap), then runs paired-only
# batches of 4 rounds, committing BENCH evidence after each, until the
# current-engine healthy-base sample reaches $TARGET rounds or $DEADLINE
# (unix epoch) passes. Run alone: no other CPU work during batches.
set -u
cd /root/repo
TARGET="${TARGET:-10}"
DEADLINE="${DEADLINE:?set DEADLINE (unix epoch)}"

count_current() {
python3 - <<'PY'
import json, re
# the SHIPPED engine revision, not the max present in the pool — before
# the first post-bump round lands, the pool's max lags the code
src = open("bench/pipeline_job.py").read()
mx = int(re.search(r"^ENGINE_REV = (\d+)", src, re.M).group(1))
d = json.load(open("BENCH/scale_evidence.json"))
cur = [r for r in d["rounds"] if r.get("rev1") == mx and r.get("rev4") == mx
       and r.get("healthy_base") and not r.get("mixed_code")]
print(len(cur))
PY
}

probe_ok() {
python3 - <<'PY'
import numpy as np, time, sys
best = 0.0
for _ in range(2):
    a = np.zeros(256*1024*1024//8, dtype=np.int64)
    t = time.time(); b = a.copy(); dt = time.time() - t
    best = max(best, 2*a.nbytes/dt/1e9)
    del a, b
sys.exit(0 if best >= 2.0 else 1)
PY
}

while true; do
  now=$(date +%s)
  if [ "$now" -ge "$DEADLINE" ]; then echo "DEADLINE reached"; break; fi
  n=$(count_current)
  echo "$(date +%H:%M:%S) current-engine healthy rounds: $n (target $TARGET)"
  if [ "$n" -ge "$TARGET" ]; then echo "TARGET reached"; break; fi
  if ! probe_ok; then sleep 90; continue; fi
  echo "$(date +%H:%M:%S) host healthy - running a 4-round paired batch"
  SPARK_GRAFT_BENCH_PAIRED_ONLY=1 SPARK_GRAFT_BENCH_PAIRED_ROUNDS=4 \
    python bench_scaling.py 2>&1 | tail -20
  git add BENCH/BASELINE.md BENCH/scale_evidence.json
  git commit -q -m "Scaling evidence: paired batch ($(count_current) current-engine healthy rounds)

No-Verification-Needed: benchmark-evidence files only" || true
done
echo "accumulator done: $(count_current) current-engine healthy rounds"
