#!/bin/bash
# Round-4 end-of-round evidence refresh (VERDICT r3 task 8): re-prove
# hardware kernel parity at HEAD, re-record the test tiers, and sanity-run
# bench.py so every surfaced number postdates the last code change.
cd /root/repo
mkdir -p results

record() { echo "{\"run\": \"$1\", \"wall_s\": $2, \"rc\": $3}" >> log/matrix_walltime.jsonl; }

s=$SECONDS
timeout 1800 python exp/tpu_kernel_check.py > /tmp/r4-kernel.log 2>&1
rc=$?
record kernel_r4 $((SECONDS - s)) $rc
tail -2 /tmp/r4-kernel.log

s=$SECONDS
timeout 1200 python -m pytest tests/ -x -q > /tmp/r4-fast.log 2>&1
fast_rc=$?
fast_wall=$((SECONDS - s))
fast_line=$(tail -1 /tmp/r4-fast.log)

s=$SECONDS
timeout 3600 python -m pytest tests/ -q -m slow > /tmp/r4-slow.log 2>&1
slow_rc=$?
slow_wall=$((SECONDS - s))
slow_line=$(tail -1 /tmp/r4-slow.log)

python - <<EOF
import json, re, time
def parse(line):
    m = re.search(r"(\d+) passed", line)
    return int(m.group(1)) if m else None
out = {
  "date": time.strftime("%Y-%m-%d"),
  "round": 4,
  "fast": {"passed": parse("""$fast_line"""), "rc": $fast_rc,
           "wall_s": $fast_wall, "cmd": "python -m pytest tests/ -x -q"},
  "slow": {"passed": parse("""$slow_line"""), "rc": $slow_rc,
           "wall_s": $slow_wall, "cmd": "python -m pytest tests/ -q -m slow"},
}
try:
    out["tpu"] = json.load(open("results/tpu_kernel_parity.json"))
    out["tpu"]["cmd"] = "python exp/tpu_kernel_check.py"
except Exception as e:
    out["tpu"] = {"error": str(e)}
json.dump(out, open("results/test_tiers.json", "w"), indent=1)
print(json.dumps(out, indent=1))
EOF

s=$SECONDS
timeout 900 python bench.py > /tmp/r4-bench.log 2>&1
record bench_r4close $((SECONDS - s)) $?
tail -1 /tmp/r4-bench.log

echo R4-CLOSE-DONE
