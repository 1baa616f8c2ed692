#!/usr/bin/env python3
"""Build bench/sf100_probe.json from the decade-4 probe TSVs.

Usage:
    python3 scripts/sf100_report.py <sf10.tsv> <sf100.tsv> <out.json> [notes.json]

factor = sf100_sec / sf10_sec; sf100 is 10x sf10 rows, so factor
<= ~12 is linear-or-better. Later TSV lines for a key override
earlier ones (re-measurements supersede contaminated first passes).
A key present in one TSV but absent from the other gets an explicit
"missing" record — a child JVM that died without writing a line must
surface as an error, not vanish from the report.
"""

import json
import sys


def read_tsv(path):
    """key -> (median_sec, [min, max] or None) for OK lines,
    or an error-string for TIMEOUT/KILLED/ERR lines."""
    out = {}
    for line in open(path):
        parts = line.strip().split("\t")
        if len(parts) < 3 or parts[0] not in ("OK", "TIMEOUT", "KILLED", "ERR"):
            continue
        key = parts[1]
        if parts[0] == "OK":
            spread = [float(parts[3]), float(parts[4])] if len(parts) >= 5 else None
            out[key] = (float(parts[2]), spread)
        else:
            out[key] = parts[0] + " " + parts[2][:120]
    return out


def main():
    sf10 = read_tsv(sys.argv[1])
    sf100 = read_tsv(sys.argv[2])
    notes = {}
    if len(sys.argv) > 4:
        notes = json.load(open(sys.argv[4]))

    qs = {}
    for key in sorted(set(sf10) | set(sf100)):
        v10, v100 = sf10.get(key), sf100.get(key)
        rec = {}
        for scale, v in (("sf10", v10), ("sf100", v100)):
            if v is None:
                rec[scale] = None
                rec["error"] = (rec.get("error", "") +
                                f" missing at {scale} (no TSV line — child "
                                "died without a result?)").strip()
            elif isinstance(v, str):
                rec[scale] = None
                rec["error"] = (rec.get("error", "") + " " + v).strip()
            else:
                rec[scale] = v[0]
                if v[1] is not None:
                    rec[scale + "_spread"] = v[1]
        if isinstance(rec.get("sf10"), float) and isinstance(rec.get("sf100"), float):
            rec["factor"] = round(rec["sf100"] / rec["sf10"], 1)
        if key in notes:
            rec["note"] = notes[key]
        qs[key] = rec

    factors = sorted(r["factor"] for r in qs.values() if r.get("factor"))
    errors = sorted(k for k in qs if qs[k].get("error"))
    out = {
        "metric": "sf100_scaling_probe",
        "unit": "sec",
        "trials": "per-key: 1 unless a *_spread field records [min, max] "
                  "of a multi-trial run (median reported)",
        "isolation": "fresh JVM per key, serialized, local[32], Xmx48g",
        "n_probed": len(qs),
        "n_errors": len(errors),
        "errors": errors,
        "median_factor": factors[len(factors) // 2] if factors else None,
        "worst_scaler": max(
            (k for k in qs if qs[k].get("factor")),
            key=lambda k: qs[k]["factor"], default=None),
        "note": ("Decade-4 probe: keys at sf100 (20M-row fact-scale "
                 "10x of sf10; ~11 GB corpus, 2M embeddings / 5M documents, "
                 "native-cardinality via ScaleUp factor 1000). factor = "
                 "sf100/sf10 at local[32]; <= ~12x is linear-or-better. "
                 "CAUTION (r9): a key probed right after another key's disk "
                 "blow-up inherits its writeback/cleanup pressure "
                 "(knn_ivf_trained read 139.4 s dirty, 25.0 s clean) - "
                 "numbers are from clean serialized sweeps unless noted."),
        "queries": qs,
    }
    with open(sys.argv[3], "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}, indent=1))
    for k in sorted(qs, key=lambda k: -(qs[k].get("factor") or 99)):
        print(k, qs[k])


if __name__ == "__main__":
    main()
