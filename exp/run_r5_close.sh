#!/bin/bash
# Round-5 end-of-round evidence refresh (keeps the r4 habit): hardware
# kernel parity at HEAD, test tiers, one clean warm spot3 timing, bench.
cd /root/repo
mkdir -p results log

record() { echo "{\"run\": \"$1\", \"wall_s\": $2, \"rc\": $3}" >> log/matrix_walltime.jsonl; }

s=$SECONDS
timeout 1800 python exp/tpu_kernel_check.py > /tmp/r5-kernel.log 2>&1
rc=$?
record kernel_r5 $((SECONDS - s)) $rc
tail -2 /tmp/r5-kernel.log

# one clean warm timing (no competing CPU jobs) for the typical-wall claim
s=$SECONDS
LASR_PHASE_TIMERS=1 timeout 3600 bash exp/time_spot3_warm.sh spot3warm5c \
  > /tmp/r5-warmc.log 2>&1
record spot3warm5c $((SECONDS - s)) $?
tail -6 /tmp/r5-warmc.log

s=$SECONDS
timeout 1200 python -m pytest tests/ -x -q > /tmp/r5-fast.log 2>&1
fast_rc=$?
fast_wall=$((SECONDS - s))
fast_line=$(tail -1 /tmp/r5-fast.log)

s=$SECONDS
timeout 3600 python -m pytest tests/ -q -m slow > /tmp/r5-slow.log 2>&1
slow_rc=$?
slow_wall=$((SECONDS - s))
slow_line=$(tail -1 /tmp/r5-slow.log)

python - <<EOF
import json, re, time
def parse(line):
    m = re.search(r"(\d+) passed", line)
    return int(m.group(1)) if m else None
out = {
  "date": time.strftime("%Y-%m-%d"),
  "round": 5,
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
timeout 900 python bench.py > /tmp/r5-bench.log 2>&1
record bench_r5close $((SECONDS - s)) $?
tail -1 /tmp/r5-bench.log

echo R5-CLOSE-DONE
