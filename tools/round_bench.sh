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
#      headroom) DEFERS its verdict to the 30x spot (r16: aborting before
#      the spot skipped the adjudication exactly when it was needed —
#      a fixed-cost-dominated sf0.1 denominator inflates the two-point
#      ratio without any real drift, q56's standing pattern).
#   4. 30x spot: the top-3 sf1-ratio queries (plus every over-gate query)
#      get a third measured point (ScaleBench 1,10,30 on the scaled
#      documents corpus) — one decade cannot distinguish linear from
#      slowly-super-linear drift; the gate fails when sec(30x)/sec(10x)
#      exceeds SPOT_MAX (default 6 = 3x data x2 headroom; a quadratic law
#      would read ~9), or when an over-gate query has no measurable third
#      point (its deferred verdict would be unadjudicated).
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
# "1,10,30" is the standing per-round spot; set "1,10,30,100" to re-pin
# the x100 decade when a span/posting-family plan changes (costs ~25 min
# extra; the x100 laws are recorded in SCALE.md round 16 — run with
# SPARK_GRAFT_SCALE_SHUFFLE_PARTITIONS sized to the decade and
# SPARK_DRIVER_MEM>=28g, see the SCALE.md notes)
SPOT_SCALES="${SPARK_GRAFT_SPOT_SCALES:-1,10,30}"

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
    # an over-gate query MUST be in the spot list: the 30x spot exists to
    # adjudicate exactly these (a fixed-cost-dominated denominator at
    # sf0.1 inflates the two-point ratio; only a third decade tells that
    # apart from genuine super-linear drift), so aborting before the spot
    # — the pre-r16 flow — skipped the adjudication the moment it was
    # actually needed. Over-gate queries are recorded for the spot step;
    # hard failures (loaded canary, errored queries) still abort here.
    spot = [q for _, q in worst[:3]] + [q for _, q in over if q not in
           [q2 for _, q2 in worst[:3]]]
    f.write(",".join(spot))
with open(sys.argv[2] + ".over", "w") as f:
    f.write(",".join(q for _, q in over))
if bad:
    sys.exit(1)
if over:
    print(f"[round_bench] two-point gate EXCEEDED by {len(over)} query(ies) — "
          "deferring the verdict to the 30x spot")
else:
    print("[round_bench] two-point gate green")
PY

TOP3="$(cat "$TOP3_FILE")"
OVER_LIST="$(cat "$TOP3_FILE.over" 2>/dev/null || true)"
rm -f "$TOP3_FILE" "$TOP3_FILE.over"
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
  sbt -batch "runMain graft.examples.ScaleBench $SF01 $SCALE_SCRATCH $SPOT_SCALES" \
  2>&1 | tee /dev/stderr | grep '"bench":"scale"' > "$SPOT_LOG" || true

python3 - "$SPOT_MAX" "$SPOT_LOG" "$OVER_LIST" <<'PY'
import json, sys, collections
spot_max = float(sys.argv[1])
over = set(q for q in (sys.argv[3] if len(sys.argv) > 3 else "").split(",") if q)
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
        # say so loudly instead of silently passing. An OVER-GATE query
        # with no third point stays UNADJUDICATED and must fail the run:
        # the two-point verdict was deferred to exactly this measurement.
        if q in over:
            print(f"[round_bench] FAIL: over-gate {q} not measurable on the scaled "
                  f"corpus (t10={t10}, t30={t30}) — the deferred two-point verdict "
                  "cannot be adjudicated; investigate against its SCALE.md law")
            bad = True
        else:
            print(f"[round_bench] SPOT-SKIP: {q} not measurable on the scaled "
                  f"corpus (t10={t10}, t30={t30}) — rely on the 10x gate + SCALE.md law")
        continue
    r = t30 / t10
    verdict = "OK" if r <= spot_max else "SUPER-LINEAR"
    tag = " [over-gate: two-point verdict deferred here]" if q in over else ""
    print(f"[round_bench] spot {q}: x10 {t10:.2f} s -> x30 {t30:.2f} s "
          f"= {r:.2f}x at 3x data ({verdict}, gate {spot_max}){tag}")
    if r > spot_max:
        bad = True
    elif q in over:
        print(f"[round_bench] over-gate {q} ADJUDICATED sub-linear by the 30x spot "
              "(fixed-cost denominator effect at the 10x point, not drift)")
if bad:
    sys.exit(1)
print("[round_bench] gate green (two-point + 30x spot)")
PY
