#!/bin/bash
# Round-4 on-chip artifact driver: device-compute-only frame benchmarks
# per config + the scaling artifact, each phase in an expendable
# deadline-bounded subprocess (the TPU tunnel stalls for minutes at a
# time; the persistent compile cache lets retries accumulate progress).
set -u
cd "$(dirname "$0")/.."
PARTS=${DF_PARTS:-/tmp/df_parts}
mkdir -p "$PARTS"

for cfg in 1080p 1080p-intra 4k 4k10-grain; do
  for attempt in 1 2 3; do
    [ -s "$PARTS/df_$cfg.json" ] && break
    echo "[artifacts] device_frame_bench $cfg (attempt $attempt)"
    timeout "${DF_DEADLINE:-2400}" python -u tools/device_frame_bench.py \
      --config "$cfg" --json "$PARTS/df_$cfg.json.tmp" \
      && mv "$PARTS/df_$cfg.json.tmp" "$PARTS/df_$cfg.json" \
      || rm -f "$PARTS/df_$cfg.json.tmp"
  done
done

python - <<'PY'
import json, glob, os
out = {}
for fp in sorted(glob.glob("/tmp/df_parts/df_*.json")):
    d = json.load(open(fp))
    out[d["config"]] = d
if out:
    json.dump(out, open("DEVICE_FRAME_r04.json", "w"), indent=1)
    print(f"wrote DEVICE_FRAME_r04.json ({len(out)} configs)")
PY

for attempt in 1 2 3; do
  [ -s /tmp/scaling_B.json ] && break
  echo "[artifacts] scaling part B (attempt $attempt)"
  timeout "${SB_DEADLINE:-2400}" python -u tools/scaling_bench.py \
    --part B --json /tmp/scaling_B.json.tmp \
    && mv /tmp/scaling_B.json.tmp /tmp/scaling_B.json \
    || rm -f /tmp/scaling_B.json.tmp
done

echo "[artifacts] scaling part A (virtual CPU mesh)"
[ -s /tmp/scaling_A.json ] || timeout 3000 python -u tools/scaling_bench.py \
  --part A --json /tmp/scaling_A.json || true

if [ -s /tmp/scaling_A.json ] && [ -s /tmp/scaling_B.json ]; then
  python tools/scaling_bench.py --merge /tmp/scaling_A.json \
    /tmp/scaling_B.json --json SCALING_r04.json
fi
echo "[artifacts] done"
