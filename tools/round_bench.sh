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
#      (min-of-3 interleaved sweeps, per-sweep canary gate: a sweep whose
#      canary reads >1.5x ref is rejected and retried before it runs, so a
#      committed report is idle-host by construction).
#   3. Gate: canary_loaded OR canary_sweep_loaded on either report fails
#      the run (rerun idle); canary_drift warns; any query scaling worse
#      than SCALE_MAX x the data factor (default 12 = linear 10x + noise
#      headroom) is listed for in-round investigation against its
#      docs/SCALE.md law.
#   4. 30x spot: the top-3 sf1-ratio queries get a third measured point
#      (ScaleBench 1,10,30 on the scaled documents corpus) — one decade
#      cannot distinguish linear from slowly-super-linear drift; the gate
#      fails when sec(30x)/sec(10x) exceeds SPOT_MAX (default 6 = 3x data
#      x2 headroom; a quadratic law would read ~9).
#
# Both reports (and the spot lines in round records) are committed per
# round; the judge reads them against BENCH_r{N}.json.
set -euo pipefail
cd "$(dirname "$0")/.."

CPUS="${SPARK_GRAFT_CPUS:-32}"
SF01="${SPARK_GRAFT_SF01:-/root/testdata/sf0.1}"
SF1_DIR="${SPARK_GRAFT_SF1_DIR:-/tmp/graft_sf1}"
SCALE_MAX="${SPARK_GRAFT_SCALE_MAX:-12}"
SPOT_MAX="${SPARK_GRAFT_SPOT_MAX:-6}"
SCALE_SCRATCH="${SPARK_GRAFT_SCALE_SCRATCH:-/tmp/graft_scale}"

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

TOP3_FILE="$(mktemp)"
python3 - "$SCALE_MAX" "$TOP3_FILE" <<'PY'
import json, sys
scale_max = float(sys.argv[1])
a = json.load(open("bench_report.json"))
b = json.load(open("bench_report_sf1.json"))
bad = False
for name, rep in (("sf0.1", a), ("sf1", b)):
    flags = []
    if rep.get("canary_loaded"): flags.append("loaded")
    if rep.get("canary_sweep_loaded"): flags.append("sweep-loaded")
    if rep.get("canary_drift"): flags.append("drift")
    retries = rep.get("canary_retries", 0)
    print(f"[round_bench] {name}: total {rep['value']:.1f} s, canary {rep['canary']} "
          f"({'+'.join(flags) or 'clean'}, {retries} sweep retries)")
    # per-sweep rejection makes a surviving loaded sweep a hard failure:
    # the committed reports must be idle-host by construction
    if rep.get("canary_loaded") or rep.get("canary_sweep_loaded"):
        bad = True
for name, rep in (("sf0.1", a), ("sf1", b)):
    # gate BOTH scales: an sf0.1-only failure used to pass (and, before
    # the `failed` field + succeeded-only total, silently LOWERED the
    # committed total — a phantom improvement)
    fails = rep.get("failed") or sorted(q for q, t in rep["queries"].items() if t < 0)
    if fails:
        print(f"[round_bench] FAIL: {len(fails)} {name} queries errored: {fails[:10]}")
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
with open(sys.argv[2], "w") as f:
    f.write(",".join(q for _, q in worst[:3]))
if bad or over:
    sys.exit(1)
print("[round_bench] two-point gate green")
PY

TOP3="$(cat "$TOP3_FILE")"; rm -f "$TOP3_FILE"
if [ -z "$TOP3" ]; then
  # no query cleared the 0.05 s ratio floor — nothing to spot-check; an
  # empty SCALE_ONLY would match no query and fail the gate as if
  # ScaleBench had crashed
  echo "[round_bench] 30x spot skipped: no sf1 ratios above the measurement floor"
  echo "[round_bench] gate green (two-point; spot not applicable)"
  exit 0
fi
echo "[round_bench] 30x spot on worst sf1 ratios: $TOP3"
SPOT_LOG="$(mktemp)"
SPARK_GRAFT_SCALE_ONLY="$TOP3" \
  sbt -batch "runMain graft.examples.ScaleBench $SF01 $SCALE_SCRATCH 1,10,30" \
  2>&1 | tee /dev/stderr | grep '"bench":"scale"' > "$SPOT_LOG" || true

python3 - "$SPOT_MAX" "$SPOT_LOG" <<'PY'
import json, sys, collections
spot_max = float(sys.argv[1])
times = collections.defaultdict(dict)
for line in open(sys.argv[2]):
    r = json.loads(line)
    times[r["query"]][r["scale"]] = r["sec"]
bad = False
if not times:
    print("[round_bench] FAIL: 30x spot produced no measurements")
    sys.exit(1)
for q, t in sorted(times.items()):
    t10, t30 = t.get(10, -1.0), t.get(30, -1.0)
    if t10 <= 0 or t30 <= 0:
        # a top-ratio query whose tables the scale scratch doesn't
        # materialize (non-documents family) can't get a third point —
        # say so loudly instead of silently passing
        print(f"[round_bench] SPOT-SKIP: {q} not measurable on the scaled "
              f"corpus (t10={t10}, t30={t30}) — rely on the 10x gate + SCALE.md law")
        continue
    r = t30 / t10
    verdict = "OK" if r <= spot_max else "SUPER-LINEAR"
    print(f"[round_bench] spot {q}: x10 {t10:.2f} s -> x30 {t30:.2f} s "
          f"= {r:.2f}x at 3x data ({verdict}, gate {spot_max})")
    if r > spot_max:
        bad = True
if bad:
    sys.exit(1)
print("[round_bench] gate green (two-point + 30x spot)")
PY
