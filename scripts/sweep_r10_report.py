#!/usr/bin/env python3
"""Fold the round-10 decade-4 sweep into bench/sf100_probe.json.

Usage:
    python3 scripts/sweep_r10_report.py <sweep_dir> <probe_json>

<sweep_dir> holds rewritten_sf10.tsv / rewritten_sf100.tsv (2-trial)
and new_sf10.tsv / new_sf100.tsv (1-trial) from sweep_r10_run.sh.

The artifact is cumulative across rounds, so every record gets a
"session" tag: r10 numbers were measured on a DIFFERENT VM than r9's
(r9: 68 GB local disk; r10: 252 GB vda, direct write ~311 MB/s, read
~1.2 GB/s measured mid-sweep) — absolute seconds are NOT comparable
across sessions; factors (sf100/sf10, both scales same session, same
serialized fresh-JVM protocol) are. Keys absent from a TSV surface as
explicit error records (the sf100_report.py rule).
"""

import json
import sys
sys.path.insert(0, "scripts")
from sf100_report import read_tsv  # noqa: E402


def fold(qs, sf10, sf100, session, trials_note):
    for key in sorted(set(sf10) | set(sf100)):
        v10, v100 = sf10.get(key), sf100.get(key)
        rec = {"session": session, "trials": trials_note}
        old = qs.get(key)
        for scale, v in (("sf10", v10), ("sf100", v100)):
            if v is None:
                rec[scale] = None
                rec["error"] = (rec.get("error", "") +
                                f" missing at {scale} (no TSV line)").strip()
            elif isinstance(v, str):
                rec[scale] = None
                rec["error"] = (rec.get("error", "") + " " + v).strip()
            else:
                rec[scale] = v[0]
                if v[1] is not None and v[1][0] != v[1][1]:
                    rec[scale + "_spread"] = v[1]
        if isinstance(rec.get("sf10"), float) and isinstance(rec.get("sf100"), float):
            rec["factor"] = round(rec["sf100"] / rec["sf10"], 1)
            # I/O-noisy keys: the warm (min) trials are the decidable
            # signal when 2 trials exist and spread > 1.5x.
            lo10 = min(rec.get("sf10_spread", [rec["sf10"]]))
            lo100 = min(rec.get("sf100_spread", [rec["sf100"]]))
            if ("sf100_spread" in rec and
                    rec["sf100_spread"][1] > 1.5 * rec["sf100_spread"][0]):
                rec["warm_factor"] = round(lo100 / lo10, 1)
        if old is not None:
            rec["note"] = ("r9 record (prior VM): sf10=%s sf100=%s factor=%s. %s"
                           % (old.get("sf10"), old.get("sf100"),
                              old.get("factor"), old.get("note", ""))).strip()
        qs[key] = rec


def main():
    sweep_dir, probe = sys.argv[1], sys.argv[2]
    d = json.load(open(probe))
    qs = d["queries"]
    fold(qs,
         read_tsv(f"{sweep_dir}/rewritten_sf10.tsv"),
         read_tsv(f"{sweep_dir}/rewritten_sf100.tsv"),
         "r10", "2 per scale (median + spread)")
    fold(qs,
         read_tsv(f"{sweep_dir}/new_sf10.tsv"),
         read_tsv(f"{sweep_dir}/new_sf100.tsv"),
         "r10", "1 per scale (blow-up detector)")
    factors = [v["factor"] for v in qs.values() if isinstance(v.get("factor"), float)]
    factors.sort()
    d["n_probed"] = len(qs)
    d["median_factor"] = round(factors[len(factors) // 2], 1)
    worst = max(((v["factor"], k) for k, v in qs.items()
                 if isinstance(v.get("factor"), float)))
    d["worst_scaler"] = worst[1]
    d["hardware_note"] = (
        "r10 session ran on a different VM than r9 (252 GB vda, direct "
        "write ~311 MB/s / read ~1.2 GB/s measured mid-sweep, vs r9's "
        "68 GB disk): sf10 (page-cache-resident) times match or beat "
        "r9's, sf100 (spill/scan I/O-bound) times run 1.5-3x r9's "
        "absolute seconds with 2-5x trial spreads. Factors within one "
        "session remain the valid scaling signal; cross-session "
        "absolute comparisons are not.")
    json.dump(d, open(probe, "w"), indent=1)
    errs = {k: v["error"] for k, v in qs.items() if v.get("error")}
    print("n_probed", d["n_probed"], "median", d["median_factor"],
          "worst", worst, "errors", errs)
    for k, v in sorted(qs.items(), key=lambda kv: -(kv[1].get("factor") or 0)):
        print(f"{k:32s} sf10={v.get('sf10')} sf100={v.get('sf100')} "
              f"factor={v.get('factor')} warm={v.get('warm_factor', '')}")


if __name__ == "__main__":
    main()
