#!/usr/bin/env bash
# Isolated-run bench adjudication — encodes the workflow rounds 4/5 ran by
# hand: take the N most expensive queries of the last full bench, re-time
# each in its OWN JVM (SPARK_GRAFT_QUERIES single-query run: same warmup,
# same forcing, min-of-runs), and print full-run vs isolated side by side.
# A ratio well above 1 means cross-query JVM state is contaminating the
# full-run numbers (round 5 measured up to 12x before Bench's per-query
# cleanup landed); a ratio near 1 means the full-run numbers are honest.
#
# The isolated runs are pinned to the SAME sf dir and CPU count the
# snapshot records ("sf"/"cpus" in the bench JSON), so the comparison is
# config-for-config — dividing a local[32] full run by a local[4]
# isolated run would read as contamination that isn't there.
#
# Usage: scripts/adjudicate.sh [N] [bench-json]
#   N          how many top queries to re-time (default 5)
#   bench-json a full-run Bench output file (default target/bench.json,
#              written by every `sbt "runMain graft.Bench"` run)
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-5}"
BENCH="${2:-target/bench.json}"
if [ ! -f "$BENCH" ]; then
  echo "no $BENCH — run a full bench first: sbt \"runMain graft.Bench\"" >&2
  exit 1
fi
# isolated runs rewrite target/bench.json; adjudicate against a snapshot
# and RESTORE the full-run record on exit so the durable file keeps being
# the last full bench, not the last single-query re-time
SNAP=$(mktemp)
trap 'cp "$SNAP" "$BENCH" 2>/dev/null || true; rm -f "$SNAP"' EXIT
cp "$BENCH" "$SNAP"

# one value per line: a space-separated read would field-shift (CPUS
# landing in SF) whenever the snapshot's "sf" is empty
{ read -r SF; read -r CPUS; } <<EOF
$(python3 -c "import json;b=json.load(open('$SNAP'));print(b.get('sf',''));print(b.get('cpus','4'))")
EOF
export SPARK_GRAFT_SF_DIR="${SF:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${CPUS:-4}"

TOP=$(python3 - "$SNAP" "$N" <<'EOF'
import json, sys
bench = json.load(open(sys.argv[1]))
qs = [(k, v) for k, v in bench["queries"].items() if v >= 0]
qs.sort(key=lambda kv: -kv[1])
for name, sec in qs[: int(sys.argv[2])]:
    print(f"{name} {sec}")
EOF
)

printf '%-28s %10s %22s %10s %7s\n' query full_run full_spread isolated ratio
first=1
while read -r name full; do
  # settle between JVMs: a dying 32-thread JVM's shutdown/GC overlaps the
  # next launch and was measured inflating an isolated run 13 s -> 41 s
  [ "$first" = 1 ] && first=0 || sleep 10
  # </dev/null: sbt's stdin reader would otherwise drain the remaining
  # here-string lines and truncate the loop to its first iteration
  if ! SPARK_GRAFT_QUERIES="$name" sbt -batch "runMain graft.Bench" \
      >/dev/null 2>&1 </dev/null; then
    printf '%-28s %10s %22s %10s %7s\n' "$name" "$full" - FAILED -
    continue
  fi
  python3 - "$name" "$full" "$SNAP" <<'EOF'
import json, sys
name, full = sys.argv[1], float(sys.argv[2])
# .get-guarded: an isolated run whose JSON lacks the query (filter typo,
# partial write) must print FAILED, not traceback with a KeyError
iso = json.load(open("target/bench.json")).get("queries", {}).get(name, -1.0)
snap = json.load(open(sys.argv[3]))
# full-run per-run spread (Bench's "spread" key; older snapshots lack it)
runs = snap.get("spread", {}).get(name)
sp = "[" + " ".join(f"{r:.2f}" for r in runs) + "]" if runs else "-"
if iso <= 0:  # Bench records -1.0 for a query that threw (sbt still exits 0)
    print(f"{name:<28} {full:>10.2f} {sp:>22} {'FAILED':>10} {'-':>7}")
else:
    print(f"{name:<28} {full:>10.2f} {sp:>22} {iso:>10.2f} {full / iso:>6.1f}x")
EOF
done <<< "$TOP"
