"""Render benchmark CSV(s) into the RESULTS.md markdown tables.

Reads the reference-schema CSV (utils/csvio.HEADER) and prints, per method,
a | Grid | Device ms | GFLOP/s | Gcell/s | model GB/s | Memory eff | table
using the reference's models (36 fl/pt, 12 or 64 B/pt — already baked into
the CSV's GFLOPS/GBps columns, main.cpp:129-144).

Usage: python scripts/results_tables.py [benchmark_r4.csv ...]
"""

import csv
import sys


def rows(path):
    with open(path) as f:
        for r in csv.DictReader(f):
            yield r


def main(paths, require_sorted=True):
    data = {}
    for p in paths:
        for r in rows(p):
            key = (r["Method"], int(r["StencilOrder"]))
            data.setdefault(key, []).append(r)
    for (method, order), rs in data.items():
        sizes = [int(r["NX"]) for r in rs]
        if require_sorted and sizes != sorted(sizes):
            # out-of-order rows mean the CSV was appended out of campaign
            # order (round-4 hygiene issue) — fail loudly so the committed
            # CSV stays size-monotonic per method (VERDICT r4 task 7)
            raise SystemExit(
                f"rows for method={method!r} order={order} are not"
                f" size-monotonic in the input CSV ({sizes}); sort the CSV"
                f" (scripts/sort_csv.py) before regenerating tables"
            )
        rs.sort(key=lambda r: int(r["NX"]))
        print(f"\n### {method} (order {order})\n")
        print("| Grid | Device ms (45 timed steps) | GFLOP/s | Gcell/s |"
              " model GB/s | Memory eff |")
        print("|---|---|---|---|---|---|")
        for r in rs:
            n = int(r["NX"])
            dev = float(r["Device_Time(ms)"])
            gf = float(r["GFLOPS"])
            gfs = float(r["GFLOPS_Std"])
            gb = float(r["GBps"])
            eff = float(r["Memory_Eff(%)"])
            steps = int(r["Timesteps"])
            gcell = n**3 * steps / (dev / 1e3) / 1e9
            print(f"| {n}³ | {dev:.2f} | {gf:.0f} ± {gfs:.0f} | {gcell:.1f}"
                  f" | {gb:.0f} | {eff:.1f} % |")


if __name__ == "__main__":
    main(sys.argv[1:] or ["benchmark_r5.csv"])
