#!/usr/bin/env python
"""Generate the frozen short-name legend for bench.py's final stdout line.

The driver that consumes bench.py records only the LAST ~2000 characters of
stdout and parses the final JSON line out of that tail (BENCH_r01 parsed a
26-query map that fit; BENCH_r04/r05 went "parsed": null when the full-name
map outgrew the tail). Full query names alone weigh ~3.4 KB for the current
158-query bench list, so a final line keyed by full names can never fit.

This script derives a deterministic short key per registered query (initials
of the underscore-separated words, widened per collision group until unique)
and freezes the mapping in bench_short_names.json next to bench.py. bench.py
loads the frozen file at runtime, so the keys are stable across rounds even
if future registrations would change collision groups; genuinely new names
are widened against the frozen set at runtime with the same rule.

Regenerate with:  python scripts/gen_bench_short_names.py   (only ADDS names;
existing assignments are never changed once frozen).
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

OUT = os.path.join(_REPO, "bench_short_names.json")
RESERVED = {"total", "rest"}  # keys bench.py itself writes into the map


def initials(name: str, k: int) -> str:
    return "".join(w[:k] for w in name.split("_"))


def assign(names: list[str], frozen: dict[str, str]) -> dict[str, str]:
    """Frozen assignments win; new names widen by collision group."""
    out = dict(frozen)
    taken = set(out.values()) | RESERVED
    remaining = sorted(n for n in names if n not in out)
    k = 1
    while remaining and k <= 12:
        groups: dict[str, list[str]] = {}
        for n in remaining:
            groups.setdefault(initials(n, k), []).append(n)
        nxt: list[str] = []
        for s, grp in sorted(groups.items()):
            if len(grp) == 1 and s not in taken:
                out[grp[0]] = s
                taken.add(s)
            else:
                nxt.extend(grp)
        remaining = nxt
        k += 1
    for n in remaining:  # pathological fallback: the full name is its own key
        out[n] = n
    return out


def main() -> None:
    from k8s_vectordb_sync_spark.queries import QUERIES

    frozen: dict[str, str] = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            frozen = json.load(f)
    names = sorted(QUERIES.keys()) + ["streaming_sync"]
    mapping = assign(names, frozen)
    assert len(set(mapping.values())) == len(mapping), "short-name collision"
    assert not (set(mapping.values()) & RESERVED), "short name shadows a reserved key"
    with open(OUT, "w") as f:
        json.dump(dict(sorted(mapping.items())), f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: {len(mapping)} names, "
          f"{sum(len(v) for v in mapping.values())} short bytes")


if __name__ == "__main__":
    main()
