#!/usr/bin/env python3
"""Round-over-round bench regression table with drift normalization.

Usage: python3 tools/regress.py <old_record.json> <new_record.json>
                                [--threshold 1.5] [--md out.md]

Inputs are committed bench records in the `target/bench_full.json` format
(BENCH_LOCAL_r{N}.json): per-query warm medians under "queries", raw
passes under "pass1..passN", and (from round 17 on) per-pass calibration
controls under "cal" ([[range_secs, scan_secs], ...]).

Why normalization: the bench box drifts 20-90% between same-code runs
(round-16 verdict: a 2.8x pass-to-pass swing inside ONE run), so a raw
new/old ratio flags phantom regressions. The drift factor here is:

  1. if BOTH records carry "cal": the ratio of total calibration medians
     (new/old) — an out-of-band normalizer that cannot be moved by query
     code; and, as a cross-check,
  2. the MEDIAN of per-query new/old ratios over shared queries — robust
     to a few real regressions (they sit in the tails), but movable if
     most queries genuinely changed speed.

The table reports ratio/drift > threshold outliers (and < 1/threshold
improvements), so a genuinely regressed query must beat the box, not
just the clock. Driver-side tooling only — not part of the shipped
library.
"""
import argparse
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def cal_median(rec):
    """Median of per-pass calibration totals (range + scan), or None."""
    cal = rec.get("cal")
    if not cal:
        return None
    totals = [r + s for r, s in cal if r >= 0 and s >= 0]
    return statistics.median(totals) if totals else None


def per_query(rec):
    """Per-query seconds: MIN over warm passes when the raw pass data is
    in the record (a 2-warm-pass median flags any single spiked pass as
    a 4x regression; the min is the spike-resistant envelope — a real
    regression raises every pass), else the record's median map."""
    import re
    passes = sorted(k for k in rec if re.fullmatch(r"pass\d+", k))
    if len(passes) >= 2:
        warm = passes[1:] if rec.get("excl_pass1") else passes
        qs = {}
        for q in rec["queries"]:
            vals = [rec[p][q] for p in warm if q in rec[p]]
            qs[q] = min(vals) if vals else rec["queries"][q]
        return qs
    return dict(rec["queries"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-delta", type=float, default=0.15,
                    help="ignore regressions whose absolute increase is "
                         "under this many seconds (task-scheduling "
                         "granularity dominates sub-100ms queries)")
    ap.add_argument("--md", help="also write the table to this file")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = per_query(old), per_query(new)
    shared = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    ratios = {q: nq[q] / oq[q] for q in shared if oq[q] > 0}
    med_ratio = statistics.median(ratios.values()) if ratios else 1.0

    oc, nc = cal_median(old), cal_median(new)
    cal_ratio = (nc / oc) if (oc and nc) else None
    # calibration is authoritative when present on both sides; the
    # median-of-ratios otherwise (and always shown as the cross-check)
    drift = cal_ratio if cal_ratio is not None else med_ratio

    lines = []
    lines.append(f"# Bench regression: {args.old} -> {args.new}")
    lines.append("")
    lines.append(f"- shared queries: {len(shared)}"
                 f" (+{len(added)} added, -{len(removed)} removed)")
    lines.append(f"- totals (warm median): {old.get('total', 0):.1f} s ->"
                 f" {new.get('total', 0):.1f} s")
    if "value_min" in old or "value_min" in new:
        lines.append(f"- totals (warm min): {old.get('value_min', '-')}"
                     f" -> {new.get('value_min', '-')}")
    if cal_ratio is not None:
        lines.append(f"- drift normalizer: calibration ratio"
                     f" {cal_ratio:.3f} (cross-check: median per-query"
                     f" ratio {med_ratio:.3f})")
    else:
        lines.append(f"- drift normalizer: median per-query ratio"
                     f" {med_ratio:.3f} (no calibration in one record)")
    lines.append("")

    thr = args.threshold
    out = [(q, r, r / drift) for q, r in ratios.items()]
    regressed = sorted(
        (t for t in out
         if t[2] > thr and nq[t[0]] - oq[t[0]] >= args.min_delta),
        key=lambda t: -t[2])
    improved = sorted((t for t in out if t[2] < 1 / thr),
                      key=lambda t: t[2])

    def table(rows, title):
        lines.append(f"## {title} (normalized ratio"
                     f" {'>' if 'Regress' in title else '<'}"
                     f" {thr if 'Regress' in title else round(1 / thr, 3)})")
        if not rows:
            lines.append("")
            lines.append("none")
            lines.append("")
            return
        lines.append("")
        lines.append("| query | old s | new s | raw ratio | normalized |")
        lines.append("|---|---|---|---|---|")
        for q, r, n in rows:
            lines.append(f"| {q} | {oq[q]:.3f} | {nq[q]:.3f}"
                         f" | {r:.2f} | {n:.2f} |")
        lines.append("")

    table(regressed, "Regressions")
    table(improved, "Improvements")
    if added:
        lines.append("## Added queries")
        lines.append("")
        for q in added:
            lines.append(f"- {q}: {nq[q]:.3f} s")
        lines.append("")
    if removed:
        lines.append("## Removed queries")
        lines.append("")
        for q in removed:
            lines.append(f"- {q} (was {oq[q]:.3f} s)")
        lines.append("")

    text = "\n".join(lines)
    print(text)
    if args.md:
        with open(args.md, "w") as f:
            f.write(text + "\n")
    # exit 1 on normalized regressions so CI-style callers can gate
    sys.exit(1 if regressed else 0)


if __name__ == "__main__":
    main()
