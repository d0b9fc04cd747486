#!/usr/bin/env python3
"""Merge a SUBSET compare report into a committed full-sweep report.

Dev-only tooling (sandbox python3 — never part of the engine). The big-SF
full oracle sweeps (CORRECTNESS_sf1_full.json / CORRECTNESS_sf3_full.json)
take hours to regenerate; when a round ADDS queries, the cheap path is a
subset Verify + compare at the big SF and a merge of the new rows into the
committed evidence file — pass/fail counters recomputed from the merged
query map, a note appended naming the merge.

usage: merge_correctness.py <full_report.json> <subset_report.json> <note>
"""
import json
import sys


def main() -> None:
    full_path, subset_path, note = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(full_path) as f:
        full = json.load(f)
    with open(subset_path) as f:
        subset = json.load(f)
    merged = dict(full.get("queries", {}))
    added = []
    for name, row in subset.get("queries", {}).items():
        # only genuinely-run rows merge; a subset run's "no Verify dump"
        # placeholders for every other query must not poison the evidence
        if isinstance(row, dict) and "err" not in row:
            merged[name] = row
            added.append(name)
    ok = sum(1 for r in merged.values()
             if r.get("values_match") and r.get("rows_match")
             and r.get("schema_match"))
    full["queries"] = dict(sorted(merged.items()))
    full["pass"] = ok
    full["fail"] = len(merged) - ok
    full["note"] = (full.get("note", "") +
                    f" | merged {len(added)} subset rows ({note})").strip(" |")
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=False)
    print(f"merged {sorted(added)} -> {full_path}: "
          f"{full['pass']} pass / {full['fail']} fail / {len(merged)} total")


if __name__ == "__main__":
    main()
