"""Materialize the deterministic porto-shaped fixture (FIXTURES.md §F2) as
a committed CSV, so the porto_clean / porto_points driver queries exercise
the REAL CSV scan path (sources/porto.read_porto_csv) and their oracles
become LIVE DuckDB SQL over the same file instead of golden parquet.

Run: python tools/gen_porto_csv.py   (regenerates tests/fixtures/porto.csv)
"""

from __future__ import annotations

import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from trajlib_spark.sources.porto import porto_fixture_rows  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures", "porto.csv"
)
HEADER = [
    "TRIP_ID", "CALL_TYPE", "ORIGIN_CALL", "ORIGIN_STAND", "TAXI_ID",
    "TIMESTAMP", "DAY_TYPE", "MISSING_DATA", "POLYLINE",
]


def main(n: int = 300, seed: int = 42) -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", newline="") as f:
        w = csv.writer(f, quoting=csv.QUOTE_MINIMAL, lineterminator="\n")
        w.writerow(HEADER)
        for row in porto_fixture_rows(n, seed):
            out = []
            for v in row:
                if v is None:
                    out.append("")
                elif isinstance(v, bool):
                    out.append("true" if v else "false")
                else:
                    out.append(v)
            w.writerow(out)
    print(f"wrote {n} trips -> {OUT}")


if __name__ == "__main__":
    main()
