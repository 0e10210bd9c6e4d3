"""Sort a benchmark CSV size-monotonically per (Method, StencilOrder),
preserving the header and every field verbatim. Rewrites the file in place.

Usage: python scripts/sort_csv.py benchmark_r5.csv
"""

import csv
import sys


def main(path):
    with open(path) as f:
        lines = f.read().splitlines()
    header = lines[0]
    fields = header.split(",")
    rdr = list(csv.DictReader(lines))
    rdr.sort(
        key=lambda r: (r["Method"], int(r["StencilOrder"]), int(r["NX"]),
                       int(r["NY"]), int(r["NZ"]))
    )
    with open(path, "w") as f:
        f.write(header + "\n")
        w = csv.DictWriter(f, fieldnames=fields)
        for r in rdr:
            w.writerow(r)
    print(f"sorted {len(rdr)} rows in {path}")


if __name__ == "__main__":
    main(sys.argv[1])
