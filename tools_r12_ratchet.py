"""Round-12 re-ratchet: pin BENCH_REFERENCE per-query medians + canary
median from N strict-run JSON files (VERDICT r11 item #1 — the r11 close
pin was taken on a degraded box and carries ~30% silent-regression slack).

Usage: python tools_r12_ratchet.py /tmp/bench_r12_run*.json
"""
from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    paths = sys.argv[1:]
    runs = [json.load(open(p)) for p in paths]
    totals = [r["value"] for r in runs]
    canaries = [r["canary_sec"] for r in runs]
    names = runs[0]["queries"].keys()
    medians = {
        n: round(statistics.median([r["queries"][n] for r in runs]), 3)
        for n in names
    }
    with open("BENCH_REFERENCE.json") as fh:
        ref = json.load(fh)
    old_total = sum(ref["queries"].values())
    ref["queries"] = medians
    ref["canary_sec"] = round(statistics.median(canaries), 3)
    ref["source"] = (
        f"round-12 OPENING re-ratchet (VERDICT r11 item #1): per-query "
        f"MEDIAN of {len(runs)} strict shared-JVM runs on the UNCHANGED "
        f"round-11 closing tree (totals {'/'.join(f'{t:.2f}' for t in totals)} s; "
        f"identical-code canaries {'/'.join(f'{c:.3f}' for c in canaries)}), "
        f"taken BEFORE any round-12 code change. The box showed intra-run "
        f"co-tenant waves (canary spread above); medians across runs damp "
        f"them. canary_sec is the same-window median. "
        f"Previous source: " + ref["source"]
    )
    with open("BENCH_REFERENCE.json", "w") as fh:
        json.dump(ref, fh, indent=1)
        fh.write("\n")
    print(
        json.dumps(
            {
                "n_runs": len(runs),
                "old_ref_total": round(old_total, 2),
                "new_ref_total": round(sum(medians.values()), 2),
                "canary_pin": ref["canary_sec"],
                "totals": totals,
                "canaries": canaries,
            }
        )
    )


if __name__ == "__main__":
    main()
