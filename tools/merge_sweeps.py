#!/usr/bin/env python3
"""Merge N independent Sweep windows into one window-robust artifact.

Usage: merge_sweeps.py out.json window1.json window2.json [...]

Each input is the one-line {"metric":"sweep",...} JSON a Sweep run prints.
The output carries, for every numeric leaf, the MEDIAN across windows plus
the per-window raw values (windows_raw), so a round-over-round artifact
diff can tell a code delta from a window swing: if the next round's median
falls inside this round's [min,max] scatter, it is the box, not the code
(r13 verdict #1 — single-window numbers moved 1.8-1.9x on untouched code).
"""
import json
import statistics
import sys


def merge(values):
    """Median for numeric leaves, recursion for dicts, first for the rest."""
    v0 = values[0]
    if isinstance(v0, dict):
        return {k: merge([v[k] for v in values]) for k in v0}
    if isinstance(v0, bool):
        return all(values)
    if isinstance(v0, (int, float)):
        m = statistics.median(values)
        return round(m, 3) if isinstance(m, float) else m
    return v0


def main():
    out_path, in_paths = sys.argv[1], sys.argv[2:]
    windows = [json.load(open(p)) for p in in_paths]
    assert len(windows) >= 2, "need at least two windows to merge"
    keys = set(windows[0])
    for w in windows[1:]:
        assert set(w) == keys, f"window key mismatch: {set(w) ^ keys}"
    merged = merge(windows)
    merged["metric"] = f"sweep_median{len(windows)}"
    merged["windows_raw"] = windows
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path} ({len(windows)} windows)")


if __name__ == "__main__":
    main()
