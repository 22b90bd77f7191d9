#!/usr/bin/env python3
"""Per-decade scale-exponent table from two Bench artifacts.

Usage: python3 tools/exponents.py <bench_lo.json> <bench_hi.json> [decades]

For each query q: exponent = log10(t_hi / t_lo) / decades (decades
defaults to 1 — e.g. sf1 -> sf10).

Memoized family build costs land on whichever family member runs first
at each SF, producing phantom exponents (round-9: q_doc_cluster_rep
read 1.38/decade while its family-true exponent was 0.58). The
artifacts' "frame_builds" ledger (an array of {key, sec, query, bytes}
records since r11 — an LRU-evicted frame rebuilt later logs two builds
with the same key, which the old object-keyed form silently collapsed
last-wins; legacy dict artifacts still parse) makes the adjudication
mechanical:

  - adj time  = raw time minus the builds the query paid at that SF
    (clamped at a 1 ms floor);
  - the FAMILY of a frame key = the union of queries that paid for it
    at either SF; family exponent = log10(sum_hi / sum_lo)/decades over
    raw times, which cancels the build-attribution shuffle entirely.

Output: every query sorted by raw exponent desc, with the adjusted
exponent beside it, then a family-sum section for each shared frame.
"""
import json
import math
import sys
from collections import defaultdict

lo_path, hi_path = sys.argv[1], sys.argv[2]
decades = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
lo = json.load(open(lo_path))
hi = json.load(open(hi_path))

qlo, qhi = lo["queries"], hi["queries"]


def records(raw):
    """Normalize the ledger to a list of {key, sec, query, bytes}.

    r11+ artifacts emit an array (duplicate keys preserved: a frame
    evicted and rebuilt logs every build); pre-r11 artifacts emit an
    object keyed by frame key (duplicates already lost — nothing to
    recover, but the table still renders).
    """
    if isinstance(raw, list):
        return raw
    return [dict(v, key=k) for k, v in raw.items()]


blo = records(lo.get("frame_builds", []))
bhi = records(hi.get("frame_builds", []))


def paid(builds):
    by_q = defaultdict(float)
    for r in builds:
        by_q[r["query"]] += r["sec"]
    return by_q


paid_lo, paid_hi = paid(blo), paid(bhi)


def exp(a, b):
    if a <= 0 or b <= 0:
        return float("nan")
    return math.log10(b / a) / decades


rows = []
for q in sorted(set(qlo) & set(qhi)):
    raw = exp(qlo[q], qhi[q])
    # when the build dominates either side's raw time, the subtraction
    # leaves a near-zero base and the adjusted exponent is arithmetic
    # noise (r10 caveat: dhash adj base ~0.04 s; r11 table rendered
    # adj 3.79 / -1.87 rows) — mark those build-dominated instead of
    # printing a number someone might read
    bd = (paid_lo.get(q, 0.0) > 0.5 * qlo[q]) or \
         (paid_hi.get(q, 0.0) > 0.5 * qhi[q])
    adj = exp(max(qlo[q] - paid_lo.get(q, 0.0), 1e-3),
              max(qhi[q] - paid_hi.get(q, 0.0), 1e-3))
    rows.append((raw, adj, bd, q, qlo[q], qhi[q]))

print(f"{'query':40s} {'t_lo':>8s} {'t_hi':>8s} {'exp':>6s} {'adj':>6s}")
for raw, adj, bd, q, a, b in sorted(rows, key=lambda r: -(r[0] if r[0] == r[0] else -9)):
    adj_s = "  (bd)" if bd else f"{adj:6.2f}"
    print(f"{q:40s} {a:8.2f} {b:8.2f} {raw:6.2f} {adj_s}")
bd_qs = [q for _, _, bd, q, _, _ in rows if bd]
if bd_qs:
    print(f"\n(bd) = build-dominated at one SF; read the family sum below "
          f"instead: {', '.join(bd_qs)}")

fams = defaultdict(set)
for r in blo + bhi:
    if r["query"]:
        fams[r["key"]].add(r["query"])
print("\nfamily sums (per shared frame key — build attribution cancels):")
for k in sorted(fams):
    qs = sorted(fams[k] | {q for q in fams[k]})
    # the family is every query that paid this key at either SF; widen
    # with nothing else — consumers that never paid are already
    # build-free on both sides and don't distort the raw sum
    slo = sum(qlo.get(q, 0.0) for q in qs)
    shi = sum(qhi.get(q, 0.0) for q in qs)
    print(f"  {k:50s} n={len(qs)} sum_lo={slo:8.2f} sum_hi={shi:8.2f} "
          f"exp={exp(slo, shi):5.2f}  [{', '.join(qs)}]")
