"""Round-over-round bench delta report.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold_pct]

Accepts either the raw bench.py output line or the driver's BENCH_rN.json
wrapper (which nests it under "parsed"). Prints per-query deltas sorted
by regression size so a plan regression is visible immediately, plus the
queries only present on one side (coverage changes are not regressions).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' section (crashed round?)")
    return d


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    rows = [(n, oq[n], nq[n], (nq[n] - oq[n]) / max(oq[n], 1e-9) * 100) for n in shared]
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':30s} {'old':>8s} {'new':>8s} {'delta%':>8s}")
    flagged = 0
    for n, o, v, pct in rows:
        mark = " <-- regressed" if pct > thresh and v - o > 0.2 else ""
        if mark:
            flagged += 1
        print(f"{n:30s} {o:8.3f} {v:8.3f} {pct:+8.1f}{mark}")
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    if only_old:
        print("dropped:", ", ".join(only_old))
    if only_new:
        print("added:", ", ".join(f"{n} ({nq[n]:.2f}s)" for n in only_new))
    so, sn = sum(oq[n] for n in shared), sum(nq[n] for n in shared)
    print(
        f"shared-query total: {so:.1f}s -> {sn:.1f}s ({(sn - so) / max(so, 1e-9) * 100:+.1f}%)"
        f" | full totals: {old.get('value')} -> {new.get('value')}"
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # piped through head — not an error
        import os

        os._exit(0)
