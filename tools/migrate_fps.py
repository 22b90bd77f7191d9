#!/usr/bin/env python3
"""One-shot pin-file fingerprint migration for FingerprintKit encoding
changes (r13: exprIds renumbered to first-occurrence ordinals instead
of stripped — the r12 ADVICE self-join-alias blind spot).

Rewrites ONLY the `fp` field of every entry in
src/test/resources/sf10_exponent_pins.json from a fresh
FingerprintDumpMain dump, keeping exp/basis/t_lo/t_hi untouched: an
encoding migration re-keys the gate, it does not re-measure anything.
Queries whose SEMANTICS changed in the same round must still go
through tools/update_pins.py --only with fresh probes — pass them via
--skip so this script refuses to touch them.

Usage:
  python3 tools/migrate_fps.py /tmp/graft_fingerprints.json \
      [--skip q_a,q_b] [--out src/test/resources/sf10_exponent_pins.json]
"""
import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("fp")
    ap.add_argument("--skip", default="")
    ap.add_argument("--out",
                    default="src/test/resources/sf10_exponent_pins.json")
    args = ap.parse_args()
    fps = json.load(open(args.fp))
    pins = json.load(open(args.out))
    skip = {q.strip() for q in args.skip.split(",") if q.strip()}
    migrated = 0
    for q, pin in pins.items():
        if q in skip:
            continue
        if q not in fps:
            raise SystemExit(f"{q}: pinned but absent from the dump — "
                             f"remove the pin or fix the dump first")
        if fps[q].startswith("error:"):
            raise SystemExit(f"{q}: dump recorded a build error ({fps[q]})")
        if pin["fp"] != fps[q]:
            pin["fp"] = fps[q]
            migrated += 1
    with open(args.out, "w") as f:
        json.dump(pins, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"migrated {migrated}/{len(pins)} fps -> {args.out}"
          + (f" (skipped: {sorted(skip)})" if skip else ""))


if __name__ == "__main__":
    main()
