"""Diff two bench result JSONs (BENCH_r{N}.json or raw bench.py output):
per-query wall-time and shuffle-byte movers, sorted by regression size.

Usage: python scripts/bench_diff.py OLD.json NEW.json [--threshold 1.3]

Accepts both the driver's wrapper shape ({"parsed": {...}}) and bench.py's
raw line.  Queries present on only one side are listed separately.  Byte
columns appear when both sides carry ``query_metrics`` (added round 4)."""

from __future__ import annotations

import argparse
import json


def _load(path: str) -> dict:
    with open(path) as fh:
        txt = fh.read().strip()
    d = json.loads(txt.splitlines()[-1]) if txt.startswith("{") is False else json.loads(txt)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3,
                    help="flag queries whose wall time moved by more than this factor")
    args = ap.parse_args()

    old, new = _load(args.old), _load(args.new)
    qo, qn = old.get("queries", {}), new.get("queries", {})
    mo, mn = old.get("query_metrics", {}), new.get("query_metrics", {})
    shared = sorted(set(qo) & set(qn))

    tot_o = sum(qo[n] for n in shared)
    tot_n = sum(qn[n] for n in shared)
    print(f"{len(shared)} shared queries: {tot_n:.1f}s vs {tot_o:.1f}s "
          f"= {tot_n / tot_o:.2f}x" if tot_o else "no shared queries")

    movers = []
    for n in shared:
        o, w = qo[n], qn[n]
        if o <= 0:
            continue
        r = w / o
        if r > args.threshold or r < 1 / args.threshold:
            movers.append((r, n, o, w))
    for r, n, o, w in sorted(movers, reverse=True):
        swo = mo.get(n, {}).get("shuffle_write_bytes")
        swn = mn.get(n, {}).get("shuffle_write_bytes")
        extra = ""
        if swo is not None and swn is not None:
            extra = f"  shuffle {swo:,} -> {swn:,}"
            if swo and swn / max(swo, 1) > args.threshold:
                extra += "  <-- SHUFFLE GREW"
        print(f"  {n:32s} {o:7.2f}s -> {w:7.2f}s ({r:.2f}x){extra}")
    if not movers:
        print("  no wall-time movers beyond threshold")

    # shuffle-byte-only regressions (time flat, plan got heavier)
    if mo and mn:
        srs = []
        for n in shared:
            a = mo.get(n, {}).get("shuffle_write_bytes", 0)
            b = mn.get(n, {}).get("shuffle_write_bytes", 0)
            if a > 4096 and b / a > args.threshold and not any(
                m[1] == n for m in movers
            ):
                srs.append((b / a, n, a, b))
        if srs:
            print("shuffle-byte regressions with flat wall time:")
            for r, n, a, b in sorted(srs, reverse=True):
                print(f"  {n:32s} {a:,} -> {b:,} bytes ({r:.2f}x)")

    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    if only_old:
        print("removed:", ", ".join(only_old))
    if only_new:
        print("added:", ", ".join(only_new))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
