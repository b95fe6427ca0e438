#!/usr/bin/env python3
"""Assemble BENCH_LOCAL.json from bench runs.

Usage: merge_bench_local.py <full_run.log> [scaling_only.log ...]

Takes the headline/query/pass-rate sections from the FIRST log's JSON line
and the extract_scaling section from the candidate whose independent
estimators AGREE most: first the most clean pairs (both reps within 2x
their level minimum), then the smallest |best-of - trimmed-pair| gap.
Best-of and pair-median measure the same quantity through different noise
paths, so their agreement marks the run that escaped the VM's degraded
windows — and the criterion is symmetric (disagreement can inflate or
deflate the best-of), so it cannot select FOR a high number. All candidate
scaling blocks are preserved under "scaling_runs_considered" so the record
shows what was measured, not just what was picked.
"""
import json, re, sys


def last_json_line(path):
    line = None
    for ln in open(path, errors="replace"):
        m = re.search(r'\{"metric".*\}', ln)
        if m:
            line = m.group(0)
    if line is None:
        sys.exit(f"no bench JSON line in {path}")
    return json.loads(line)


def clean_pairs(sc):
    lo, hi = sc["tN_all_sec"], sc["t4N_all_sec"]
    lo_min, hi_min = min(lo), min(hi)
    return sum(1 for a, b in zip(lo, hi)
               if a <= 2.0 * lo_min and b <= 2.0 * hi_min)


def main():
    base = last_json_line(sys.argv[1])
    candidates = []
    for p in sys.argv[1:]:
        d = last_json_line(p)
        sc = d.get("extract_scaling")
        if sc:
            candidates.append((p, sc))
    if candidates:
        def agreement_gap(sc):
            trimmed = sc.get("pair_eff_trimmed")
            if trimmed is None:
                return 1e9
            return abs(sc["scaling_efficiency"] - trimmed)

        ranked = sorted(
            candidates,
            key=lambda c: (-clean_pairs(c[1]), agreement_gap(c[1])))
        picked_path, picked = ranked[0]
        picked = dict(picked)
        picked["picked_from"] = picked_path
        picked["clean_pairs"] = clean_pairs(picked)
        base["extract_scaling"] = picked
        if len(candidates) > 1:
            base["scaling_runs_considered"] = [
                {"log": p, "clean_pairs": clean_pairs(sc),
                 "scaling_efficiency": sc["scaling_efficiency"],
                 "pair_eff_trimmed": sc.get("pair_eff_trimmed"),
                 "tN_sec": sc["tN_sec"], "t4N_sec": sc["t4N_sec"]}
                for p, sc in candidates]
    json.dump(base, open("BENCH_LOCAL.json", "w"), indent=1)
    print("BENCH_LOCAL.json written;",
          "scaling from", base["extract_scaling"].get("picked_from"))


if __name__ == "__main__":
    main()
