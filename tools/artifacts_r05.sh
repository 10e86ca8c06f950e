#!/bin/bash
# Round-5 on-chip artifact driver.  Every phase runs in an expendable
# deadline-bounded subprocess (the TPU tunnel stalls for minutes at a
# time; the persistent compile cache lets retries accumulate progress),
# and every multi-part product is resumable:
#   1. wait for any already-running scaling part B loop to finish
#   2. device-frame configs (df_parts scheme, fresh r5 kernels)
#   3. kernel-bench families (kb_parts scheme)
#   4. merge everything into the repo-root artifacts
set -u
cd "$(dirname "$0")/.."
PARTS=${DF_PARTS:-/tmp/r05/df_parts}
KB=${KB_PARTS:-/tmp/r05/kb_parts}
mkdir -p "$PARTS" "$KB"

# 1. don't fight the scaling-B loop for the chip
while pgrep -f "scaling_bench.py --part B" >/dev/null 2>&1; do
  sleep 60
done

# 2. device-frame configs (1080p-intra first: it never produced a
# number in r4 — 3 attempts, the intra chain now has a sticky fallback)
for cfg in 1080p-intra 1080p 4k 4k10-grain; do
  for attempt in 1 2 3; do
    [ -s "$PARTS/df_$cfg.json" ] && break
    echo "[artifacts] device_frame_bench $cfg (attempt $attempt)"
    timeout "${DF_DEADLINE:-2700}" python -u tools/device_frame_bench.py \
      --config "$cfg" --json "$PARTS/df_$cfg.json.tmp" \
      && mv "$PARTS/df_$cfg.json.tmp" "$PARTS/df_$cfg.json" \
      || rm -f "$PARTS/df_$cfg.json.tmp"
  done
done

python - <<PY
import json, glob
out = {}
for fp in sorted(glob.glob("$PARTS/df_*.json")):
    d = json.load(open(fp))
    out[d["config"]] = d
if out:
    json.dump(out, open("DEVICE_FRAME_r05.json", "w"), indent=1)
    print(f"merged DEVICE_FRAME_r05.json ({len(out)} configs)")
PY

# 3. kernel-bench families
FAMS="itx cdef mc lr fg resize ipred deblock"
for attempt in $(seq 1 "${KB_ATTEMPTS:-8}"); do
  missing=0
  for fam in $FAMS; do
    [ -s "$KB/$fam.json" ] && continue
    echo "[artifacts] kernel_bench $fam (attempt $attempt)"
    DAV1D_TPU_KB_E2E=0 timeout "${KB_DEADLINE:-1200}" \
      python -u tools/kernel_bench.py "$fam" --json "$KB/$fam.json.tmp" \
      && mv "$KB/$fam.json.tmp" "$KB/$fam.json" \
      || { rm -f "$KB/$fam.json.tmp"; missing=1; }
  done
  [ "$missing" = 0 ] && break
done

python - <<PY
import json, glob
merged = None
for fp in sorted(glob.glob("$KB/*.json")):
    d = json.load(open(fp))
    if merged is None:
        merged = d
    else:
        merged["results"].extend(d.get("results", []))
if merged:
    json.dump(merged, open("KERNEL_BENCH_r05.json", "w"), indent=1)
    print(f"merged KERNEL_BENCH_r05.json "
          f"({len(merged['results'])} rows)")
PY
echo "[artifacts] done"
