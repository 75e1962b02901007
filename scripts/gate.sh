#!/usr/bin/env bash
# Full pre-bench gate (VERDICT r4 item 7): one command that runs everything
# required before recording a perf number or refreshing a bench artifact.
#
#   fast suite      — pytest default selection (< ~10 min, virtual CPU mesh)
#   slow suite      — -m "slow": the e2e CLI flows and long-scan tests the
#                     fast selection deselects (fast + slow = full suite)
#   TPU equivalence — ANYV2V_TESTS_TPU=1 compiled-kernel gate on the real chip
#                     (skipped automatically when no TPU backend is present)
#   multichip dryrun — __graft_entry__.dryrun_multichip(8) on the virtual mesh
#
# Writes GATE.json at the repo root with per-leg rc + wall time; exits
# non-zero if any leg fails. Usage:  bash scripts/gate.sh [--fast-only]

set -u
cd "$(dirname "$0")/.."

FAST_ONLY=0
[ "${1:-}" = "--fast-only" ] && FAST_ONLY=1

declare -A RC TIME
run_leg() {
  local name="$1"; shift
  echo "=== gate leg: $name ===" >&2
  local t0=$SECONDS
  "$@"
  RC[$name]=$?
  TIME[$name]=$((SECONDS - t0))
  echo "=== gate leg $name: rc=${RC[$name]} (${TIME[$name]}s) ===" >&2
}

run_leg fast python -m pytest tests/ -q -x
if [ "$FAST_ONLY" = "0" ]; then
  run_leg slow python -m pytest tests/ -q -m "slow"
  run_leg tpu_equivalence env ANYV2V_TESTS_TPU=1 \
    python -m pytest tests/test_tpu_equivalence.py -q -m ""
  run_leg multichip python - <<'EOF'
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__
__graft_entry__.dryrun_multichip(8)
EOF
fi

python - <<EOF
import json, subprocess, datetime
rc = {$(for k in "${!RC[@]}"; do printf '"%s": %s, ' "$k" "${RC[$k]}"; done)}
secs = {$(for k in "${!TIME[@]}"; do printf '"%s": %s, ' "$k" "${TIME[$k]}"; done)}
head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                      capture_output=True, text=True).stdout.strip()
rec = {"commit": head,
       "utc": datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds"),
       "legs": {k: {"rc": rc[k], "seconds": secs[k]} for k in rc},
       "ok": all(v == 0 for v in rc.values())}
with open("GATE.json", "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps(rec))
EOF

for k in "${!RC[@]}"; do
  [ "${RC[$k]}" != "0" ] && exit 1
done
exit 0
