#!/usr/bin/env python3
"""Maintain the mechanized 10x-probe pin file (round-11 verdict #4).

Merges a fingerprint dump (Test/runMain graft.FingerprintDumpMain) with
measured sf1/sf10 bench artifacts into
src/test/resources/sf10_exponent_pins.json, which Sf10GateSpec enforces:
a query whose live plan fingerprint differs from its pin fails the
suite until a fresh exponent is pinned here.

Usage:
  python3 tools/update_pins.py <fp.json> <bench_sf1.json> <bench_sf10.json> \
      [--only q_a,q_b] [--out PATH]

Without --only, every query present in BOTH bench artifacts is
(re)pinned. With --only, just those queries are updated and the rest of
the existing pin file is preserved — the targeted-probe workflow:

  SPARK_GRAFT_BENCH_ONLY=q_x SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
      sbt -batch "runMain graft.Bench" 2>/dev/null | grep metric > lo.json
  (same at /tmp/graft_sf10) ...
  sbt -batch "Test/runMain graft.FingerprintDumpMain"
  python3 tools/update_pins.py /tmp/graft_fingerprints.json lo.json hi.json --only q_x

The pinned exponent is the ADJUDICATED one: raw log10(t_hi/t_lo) unless
the query paid a memoized frame build at either SF, in which case the
build-dominated raw is replaced by the FAMILY-SUM exponent (build
attribution cancels across the family — tools/exponents.py rationale).
"""
import argparse
import json
import math
import os
from collections import defaultdict


def load_metric(path):
    with open(path) as f:
        text = f.read()
    for line in reversed(text.splitlines()):
        i = line.find("{")
        if i < 0:
            continue
        try:
            obj = json.loads(line[i:])
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and "queries" in obj:
            return obj
    raise SystemExit(f"{path}: no bench metric line found")


def records(raw):
    if isinstance(raw, list):
        return raw
    return [dict(v, key=k) for k, v in raw.items()]


def exponent(lo_t, hi_t):
    if lo_t <= 0 or hi_t <= 0:
        return float("nan")
    return math.log10(hi_t / lo_t)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("fp")
    ap.add_argument("lo")
    ap.add_argument("hi")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out",
                    default="src/test/resources/sf10_exponent_pins.json")
    args = ap.parse_args()

    fps = json.load(open(args.fp))
    lo, hi = load_metric(args.lo), load_metric(args.hi)
    qlo, qhi = lo["queries"], hi["queries"]
    blo, bhi = records(lo.get("frame_builds", [])), records(hi.get("frame_builds", []))

    # prepare-phase builds run OUTSIDE the timed window (Bench marks
    # them since r13): they can never inflate a query's timing, so they
    # neither count toward build-domination nor define a family.
    # Artifacts predating the phase field count everything, as before.
    def timed(r):
        return r.get("phase", "timed") != "prepare"
    paid_lo, paid_hi = defaultdict(float), defaultdict(float)
    for r in blo:
        if timed(r):
            paid_lo[r["query"]] += r["sec"]
    for r in bhi:
        if timed(r):
            paid_hi[r["query"]] += r["sec"]
    fams = defaultdict(set)
    for r in blo + bhi:
        if r["query"] and timed(r):
            fams[r["key"]].add(r["query"])

    def family_of(q):
        out = {q}
        for members in fams.values():
            if q in members:
                out |= members
        return out

    def pinned_exp(q):
        raw = exponent(qlo[q], qhi[q])
        bd = paid_lo.get(q, 0) > 0.5 * qlo[q] or paid_hi.get(q, 0) > 0.5 * qhi[q]
        if not bd:
            return raw, "raw"
        # In a TARGETED (subset) artifact the build log cannot name the
        # family — the build is paid once, by whichever member ran, so
        # the payer list never spans the family. A build-dominated
        # query benched alone would therefore "family-sum" against
        # itself and pin the build's own scaling as its exponent — the
        # exact inflation the adjudication exists to cancel (r12 ADVICE
        # finding). Rules: a singleton subset is refused outright; a
        # multi-query subset IS the family (the workflow benches the
        # whole family under one --only).
        subset = set(lo.get("subset", []) or []) | set(hi.get("subset", []) or [])
        if subset:
            # mirror the full-catalog guard: a named subset member that
            # failed (or is missing from one artifact) would silently
            # under-cancel the shared build — fail loudly instead
            absent = sorted(m for m in subset if m not in qlo or m not in qhi)
            if absent:
                raise SystemExit(
                    f"{q}: build-dominated, but subset members {absent} are "
                    f"missing from a bench artifact (failed or not timed) — "
                    f"re-run both probes with the full family green")
            fam = subset & set(qlo) & set(qhi)
            if fam <= {q}:
                raise SystemExit(
                    f"{q}: build-dominated inside a single-query bench "
                    f"artifact — the family-sum adjudication needs the whole "
                    f"family benched together. Re-run both probes with "
                    f"SPARK_GRAFT_BENCH_ONLY=<{q} plus its frame family> "
                    f"(see frame_builds in the last full-catalog artifact)")
        else:
            fam = family_of(q)
            # a full-catalog artifact must still carry every member it
            # itself named — a partial sum under-cancels the build
            absent = sorted(m for m in fam if m not in qlo or m not in qhi)
            if absent:
                raise SystemExit(
                    f"{q}: build-dominated, but family members {absent} are "
                    f"missing from a bench artifact — re-run the probes with "
                    f"the full family present in both")
        slo = sum(qlo[m] for m in fam)
        shi = sum(qhi[m] for m in fam)
        return exponent(slo, shi), f"family[{len(fam)}]"

    targets = set(qlo) & set(qhi)
    if args.only:
        only = {q.strip() for q in args.only.split(",") if q.strip()}
        missing = only - targets
        if missing:
            raise SystemExit(f"--only queries absent from an artifact: {sorted(missing)}")
        targets = only

    pins = {}
    if os.path.exists(args.out):
        pins = json.load(open(args.out))

    for q in sorted(targets):
        if q not in fps:
            raise SystemExit(f"{q}: no fingerprint in {args.fp}")
        e, basis = pinned_exp(q)
        pins[q] = {
            "fp": fps[q],
            "exp": round(e, 3),
            "basis": basis,
            "t_lo": round(qlo[q], 3),
            "t_hi": round(qhi[q], 3),
        }

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(pins, f, indent=1, sort_keys=True)
        f.write("\n")
    over = [q for q in targets if pins[q]["exp"] > 1.04]
    print(f"pinned {len(targets)} queries -> {args.out} "
          f"({len(pins)} total); over 1.04/decade: {over or 'none'}")


if __name__ == "__main__":
    main()
