#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query table from min-combined pass
files (run after a re-pairing: two graft.Bench passes + two
tools/baseline.py passes per scale factor).

Usage: python3 tools/repair_baseline.py \
    <spark_sf001_p1_full.json> <spark_sf001_p2_full.json> \
    <spark_sf01_p1_full.json> <spark_sf01_p2_full.json> \
    <ddb_sf001_min.json> <ddb_sf01_min.json>

Prints the headline numbers and rewrites the table section in place.
"""
import json
import sys


def spark_min(p1, p2):
    a = json.load(open(p1))["queries"]
    b = json.load(open(p2))["queries"]
    return {k: min(a[k], b[k]) for k in a}


def main():
    s001 = spark_min(sys.argv[1], sys.argv[2])
    s01 = spark_min(sys.argv[3], sys.argv[4])
    d001 = json.load(open(sys.argv[5]))
    d01 = json.load(open(sys.argv[6]))
    keys = sorted(s001)
    assert set(keys) == set(d001) == set(d01) == set(s01)
    print(f"n = {len(keys)}")
    t_s001, t_s01 = sum(s001.values()), sum(s01.values())
    t_d001, t_d01 = sum(d001.values()), sum(d01.values())
    print(f"spark  sf0.01 {t_s001:6.1f}  sf0.1 {t_s01:6.1f}  "
          f"marginal {t_s01 - t_s001:6.1f}")
    print(f"duckdb sf0.01 {t_d001:6.1f}  sf0.1 {t_d01:6.1f}  "
          f"marginal {t_d01 - t_d001:6.1f}")
    print(f"marginal ratio {(t_s01 - t_s001) / (t_d01 - t_d001):.2f}x")
    lines = ["| query | spark sf0.01 | spark sf0.1 | duckdb sf0.01 "
             "| duckdb sf0.1 |", "|---|---|---|---|---|"]
    for k in keys:
        lines.append(f"| `{k}` | {s001[k]:.2f} | {s01[k]:.2f} "
                     f"| {d001[k]:.3f} | {d01[k]:.3f} |")
    md = open("BASELINE.md").read()
    head, _, tail = md.partition("## Per-query seconds")
    new = head + "## Per-query seconds\n\n" + "\n".join(lines) + "\n"
    open("BASELINE.md", "w").write(new)
    print("BASELINE.md table rewritten "
          f"({len(lines) - 2} rows){' (tail dropped)' if tail else ''}")


if __name__ == "__main__":
    main()
