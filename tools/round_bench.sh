#!/usr/bin/env bash
# The standing two-point perf gate: run the full bench at sf0.1 AND sf1
# every round, so a latent super-linear operator (the q67 class — 748x at
# 10x data until its df cap landed) is caught in the round it regresses,
# not rediscovered by a later ad-hoc experiment.
#
# Protocol (README "Bench protocol"):
#   1. Materialize sf1 (idempotent: MakeSf's _READY fingerprint makes the
#      rebuild a no-op while fresh, so a bench can never read a dir a
#      rebuild is mid-overwrite on — the round-13 overwrite race).
#   2. Bench sf0.1 -> bench_report.json, sf1 -> bench_report_sf1.json
#      (min-of-3 interleaved sweeps, canary per sweep).
#   3. Gate: canary_loaded on either report fails the run (rerun idle);
#      canary_drift warns; any query scaling worse than SCALE_MAX x the
#      data factor (default 12 = linear 10x + noise headroom) is listed
#      for in-round investigation against its docs/SCALE.md law.
#
# Both reports are committed per round; the judge reads them against
# BENCH_r{N}.json.
set -euo pipefail
cd "$(dirname "$0")/.."

CPUS="${SPARK_GRAFT_CPUS:-32}"
SF01="${SPARK_GRAFT_SF01:-/root/testdata/sf0.1}"
SF1_DIR="${SPARK_GRAFT_SF1_DIR:-/tmp/graft_sf1}"
SCALE_MAX="${SPARK_GRAFT_SCALE_MAX:-12}"

echo "[round_bench] materializing sf1 at $SF1_DIR (no-op when fresh)"
sbt -batch "runMain graft.examples.MakeSf $SF01 $SF1_DIR 10" | grep make_sf
test -f "$SF1_DIR/_READY" || { echo "[round_bench] sf1 dir not ready" >&2; exit 1; }

echo "[round_bench] sf0.1 sweep"
SPARK_GRAFT_SF_DIR="$SF01" SPARK_GRAFT_CPUS="$CPUS" \
  SPARK_GRAFT_BENCH_REPORT=bench_report.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'

echo "[round_bench] sf1 sweep"
SPARK_GRAFT_SF_DIR="$SF1_DIR" SPARK_GRAFT_CPUS="$CPUS" \
  SPARK_GRAFT_BENCH_REPORT=bench_report_sf1.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'

python3 - "$SCALE_MAX" <<'PY'
import json, sys
scale_max = float(sys.argv[1])
a = json.load(open("bench_report.json"))
b = json.load(open("bench_report_sf1.json"))
bad = False
for name, rep in (("sf0.1", a), ("sf1", b)):
    flags = "loaded" if rep.get("canary_loaded") else (
        "drift" if rep.get("canary_drift") else "clean")
    print(f"[round_bench] {name}: total {rep['value']:.1f} s, canary {rep['canary']} ({flags})")
    if rep.get("canary_loaded"):
        bad = True
fails = sorted(q for q, t in b["queries"].items() if t < 0)
if fails:
    print(f"[round_bench] FAIL: {len(fails)} sf1 queries errored: {fails[:10]}")
    bad = True
worst = sorted(((b["queries"][q] / a["queries"][q], q)
                for q in b["queries"]
                if a["queries"].get(q, 0) > 0.05 and b["queries"][q] > 0),
               reverse=True)
over = [(r, q) for r, q in worst if r > scale_max]
for r, q in over:
    print(f"[round_bench] SUPER-LINEAR: {q} scales {r:.1f}x at 10x data "
          f"({a['queries'][q]:.2f} -> {b['queries'][q]:.2f} s) — check docs/SCALE.md law")
print(f"[round_bench] top ratios: " +
      ", ".join(f"{q}={r:.1f}x" for r, q in worst[:5]))
if bad or over:
    sys.exit(1)
print("[round_bench] gate green")
PY
