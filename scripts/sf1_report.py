#!/usr/bin/env python3
"""Build BENCH_r{N}_sf1.json from two Bench full artifacts.

Usage:
    python3 scripts/sf1_report.py <sf1_full.json> <sf01_full.json> <out.json> [notes.json]

factor = sf1_sec / sf0.1_median. sf1 data volume is 10x sf0.1, so
factor <= ~10 is linear-or-better; the report flags everything above
FLAG (12, allowing constant overhead amortization noise on sub-second
queries). notes.json (optional) maps query -> adjudication string,
merged into the per-query records.

Both inputs must come from the same bench configuration (same
SPARK_GRAFT_CPUS, same jvm-per-suite isolation) or factors are noise.
"""

import json
import sys


def main():
    sf1_path, sf01_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    notes = {}
    if len(sys.argv) > 4:
        with open(sys.argv[4]) as f:
            notes = json.load(f)
    with open(sf1_path) as f:
        sf1 = json.load(f)
    with open(sf01_path) as f:
        sf01 = json.load(f)

    qs = {}
    for k, v01 in sorted(sf01["queries"].items()):
        v1 = sf1["queries"].get(k)
        if v1 is None:
            qs[k] = {"sf0.1": v01, "sf1": None, "factor": None,
                     "note": sf1.get("errors", {}).get(k, "missing at sf1")}
            continue
        rec = {"sf0.1": v01, "sf1": v1,
               "factor": round(v1 / v01, 1) if v01 > 0 else None}
        if k in notes:
            rec["note"] = notes[k]
        qs[k] = rec

    factored = {k: r for k, r in qs.items() if r.get("factor") is not None}
    flagged = {k: r["factor"] for k, r in factored.items() if r["factor"] > 12}
    worst = max(factored, key=lambda k: factored[k]["factor"]) if factored else None
    out = {
        "metric": "sf1_scaling_probe",
        "unit": "sec",
        "sf0.1_trials": sf01.get("trials"),
        "sf1_trials": sf1.get("trials"),
        "isolation": sf1.get("isolation"),
        "n_queries": len(qs),
        "n_probed": len(factored),
        "median_factor": sorted(r["factor"] for r in factored.values())[
            len(factored) // 2] if factored else None,
        "worst_scaler": worst,
        "flagged_gt12x": dict(sorted(flagged.items(), key=lambda kv: -kv[1])),
        "note": ("sf1 = 10x sf0.1 via ScaleUp (entity keys shifted per copy; "
                 "documents/embeddings native-cardinality: per-language unigram "
                 "resample / 0.5-sigma jitter, NOT key-shifted replicas). "
                 "factor = sf1_sec / sf0.1_median; <=10x is linear. Both runs "
                 "jvm-per-suite isolated, SPARK_GRAFT_CPUS=32, same session "
                 "shape - the r6 cross-suite contamination mode is closed."),
        "queries": qs,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{len(factored)}/{len(qs)} probed, median factor "
          f"{out['median_factor']}, worst {worst} "
          f"({factored[worst]['factor'] if worst else '-'}x), "
          f"{len(flagged)} flagged >12x")
    for k, v in sorted(flagged.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {v:6.1f}x {k} ({qs[k]['sf0.1']:.2f}s -> {qs[k]['sf1']:.2f}s)")


if __name__ == "__main__":
    main()
