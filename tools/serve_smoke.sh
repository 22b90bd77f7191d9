#!/bin/bash
# Serving-layer smoke (round-10 verdict #6) — part of the end-of-session
# pin cycle, after the correctness gates.
#
# ApiServerSpec already drives gzip/CORS/parity over a real socket, but
# only against an ApiServer constructed in-process. This script runs the
# ACTUAL operator path: `Test/runMain graft.ServeSmokeGen` builds the
# ingest-chain warehouse + ExportJob batch export, then the real
# `graft.jobs.Main serve` CLI boots on an ephemeral port and every
# endpoint body (identity AND gzip) is byte-compared to the batch files.
# Catches CLI-wiring or body-memo drift the unit spec cannot.
#
# Expect: three "ok:" lines, exit 0.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/graft_serve_smoke}
rm -rf "$OUT"; mkdir -p "$OUT"

sbt -batch "Test/runMain graft.ServeSmokeGen $OUT" >"$OUT/gen.log" 2>&1 ||
  { echo "ServeSmokeGen failed:"; tail -20 "$OUT/gen.log"; exit 1; }
WH=$(cat "$OUT/warehouse_dir")

sbt -batch "runMain graft.jobs.Main serve $WH 0" >"$OUT/serve.log" 2>&1 &
SBT_PID=$!
cleanup() {
  kill "$SBT_PID" 2>/dev/null || true
  pkill -f 'graft.jobs.Main serve' 2>/dev/null || true
}
trap cleanup EXIT

PORT=
for _ in $(seq 1 90); do
  PORT=$(grep -oE 'listening on http://127\.0\.0\.1:[0-9]+' "$OUT/serve.log" \
    | grep -oE '[0-9]+$' || true)
  [ -n "$PORT" ] && break
  sleep 2
done
[ -n "$PORT" ] || { echo "server never came up:"; tail -20 "$OUT/serve.log"; exit 1; }

fail=0
check() { # endpoint exportfile
  ep=$1; f="$OUT/export/$2"
  curl -sf "http://127.0.0.1:$PORT/api/$ep" -o "$OUT/$ep.plain"
  curl -sf -H 'Accept-Encoding: gzip' "http://127.0.0.1:$PORT/api/$ep" \
    | gunzip >"$OUT/$ep.gunzipped"
  ok=1
  cmp -s "$OUT/$ep.plain" "$f" || { echo "MISMATCH /api/$ep (identity) vs $2"; ok=0; }
  cmp -s "$OUT/$ep.gunzipped" "$f" || { echo "MISMATCH /api/$ep (gzip) vs $2"; ok=0; }
  [ $ok = 1 ] && echo "ok: /api/$ep == $2 ($(wc -c <"$f") bytes, identity+gzip)" || fail=1
}
check food-gaps food_gaps.json
check poverty-by-zip poverty_by_zip.json
check rent-by-zip rent_by_zip.json

# Concurrency: 32 parallel GETs per endpoint, half gzip — every body
# must be byte-identical to the batch export (pins the cached feature
# frames' thread safety under the real server; round-11 verdict #7).
conc() { # endpoint exportfile
  ep=$1; f="$OUT/export/$2"; mkdir -p "$OUT/conc_$ep"
  pids=""
  for i in $(seq 1 32); do
    if [ $((i % 2)) = 0 ]; then
      curl -sf -H 'Accept-Encoding: gzip' "http://127.0.0.1:$PORT/api/$ep" \
        | gunzip >"$OUT/conc_$ep/$i" &
    else
      curl -sf "http://127.0.0.1:$PORT/api/$ep" -o "$OUT/conc_$ep/$i" &
    fi
    pids="$pids $!"
  done
  # wait ONLY on the curls (a bare `wait` would block on the sbt server)
  for p in $pids; do wait "$p" || true; done
  ok=1
  for i in $(seq 1 32); do
    cmp -s "$OUT/conc_$ep/$i" "$f" ||
      { echo "MISMATCH /api/$ep concurrent request $i"; ok=0; }
  done
  [ $ok = 1 ] && echo "ok: /api/$ep 32-way concurrent (16 identity + 16 gzip)" || fail=1
}
conc food-gaps food_gaps.json
conc poverty-by-zip poverty_by_zip.json
conc rent-by-zip rent_by_zip.json
exit $fail
