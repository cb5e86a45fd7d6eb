"""Regenerate plans/last_green.json from the driver CORRECTNESS artifacts.

A query's row is *green* when the driver recorded no error and every
recorded match flag is true (hash_match when present, else rows-only).
The output maps query name -> latest round with a green row; queries
with no green row ever are absent (the rotation treats absent as round
0, pinning them to the front of the driver window).

Run after each driver round lands a new CORRECTNESS_r{N}.json:

    python tools/gen_last_green.py
"""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(
    ROOT,
    "amazon_lookout_for_equipment_python_sdk_spark",
    "plans",
    "last_green.json",
)


def row_is_green(v: dict) -> bool:
    return (
        v.get("err") is None
        and bool(v.get("rows_match"))
        and bool(v.get("schema_match", True))
        and bool(v.get("hash_match", True))
    )


def build() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name, v in json.load(open(f)).items():
            if row_is_green(v):
                last[name] = max(last.get(name, 0), rnd)
    return last


def main() -> None:
    last = build()
    with open(OUT, "w") as fh:
        json.dump(dict(sorted(last.items())), fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {OUT}: {len(last)} queries with a green driver row")


if __name__ == "__main__":
    main()
