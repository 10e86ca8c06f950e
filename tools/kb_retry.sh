#!/bin/bash
# Opportunistic kernel-bench driver: the TPU tunnel wedges for minutes
# at a time, so each family runs in an expendable subprocess with a
# deadline and failed families are retried until every part exists (or
# the attempt budget runs out).  Parts merge into the final artifact.
set -u
cd "$(dirname "$0")/.."
PARTS=${KB_PARTS:-/tmp/kb_parts}
OUT=${1:-KERNEL_BENCH_r03.json}
FAMS="itx cdef mc lr fg resize ipred deblock"
mkdir -p "$PARTS"
for attempt in $(seq 1 ${KB_ATTEMPTS:-12}); do
  missing=0
  for f in $FAMS; do
    [ -s "$PARTS/$f.json" ] && continue
    echo "[kb_retry] attempt $attempt: $f"
    DAV1D_TPU_KB_E2E=0 timeout "${KB_DEADLINE:-900}" \
      python -u tools/kernel_bench.py "$f" --json "$PARTS/$f.json.tmp" \
      && mv "$PARTS/$f.json.tmp" "$PARTS/$f.json" \
      || { rm -f "$PARTS/$f.json.tmp"; missing=1; }
  done
  [ "$missing" = 0 ] && break
  echo "[kb_retry] round $attempt incomplete; sleeping"
  sleep "${KB_SLEEP:-180}"
done
python - "$OUT" "$PARTS" <<'PY'
import json, sys, glob, os
out, parts = sys.argv[1], sys.argv[2]
rows, meta = [], {}
for fp in sorted(glob.glob(os.path.join(parts, "*.json"))):
    d = json.load(open(fp))
    meta = {k: d[k] for k in ("backend", "n_devices", "device",
                              "compute_reps", "note") if k in d}
    rows += d.get("results", [])
if rows:
    meta["results"] = rows
    json.dump(meta, open(out, "w"), indent=1)
    print(f"merged {len(rows)} rows -> {out}")
else:
    print("no parts succeeded; nothing written")
PY
