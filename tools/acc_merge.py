"""Merge parallel per-run accuracy outputs into ACCURACY_r04.json.

Usage: python tools/acc_merge.py /tmp/acc_*.json
Appends every run row found in the argument files to the main artifact,
skipping rows already present (exact experiment+profile/note match).
"""
import json
import os
import sys

MAIN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "ACCURACY_r04.json")


def key(row):
    return (row.get("experiment"), row.get("profile"), row.get("note"),
            row.get("delay_s"), row.get("period_s"), row.get("preview"))


def main():
    rows = []
    if os.path.exists(MAIN):
        with open(MAIN) as f:
            rows = json.load(f).get("runs", [])
    seen = {key(r) for r in rows}
    added = 0
    for path in sys.argv[1:]:
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for row in json.load(f).get("runs", []):
                if key(row) not in seen:
                    rows.append(row)
                    seen.add(key(row))
                    added += 1
    with open(MAIN, "w") as f:
        json.dump({"round": 4, "runs": rows}, f, indent=1, default=str)
    print(f"merged {added} new rows -> {len(rows)} total")


if __name__ == "__main__":
    main()
