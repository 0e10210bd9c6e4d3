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


def main(paths):
    data = {}
    for p in paths:
        for r in rows(p):
            key = (r["Method"], int(r["StencilOrder"]))
            data.setdefault(key, []).append(r)
    for (method, order), rs in data.items():
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
    main(sys.argv[1:] or ["benchmark_r4.csv"])
