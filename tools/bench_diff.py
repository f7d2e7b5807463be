#!/usr/bin/env python3
"""Compare two Bench per-query JSON outputs and flag drifts.

Usage: bench_diff.py <old.json-or-raw> <new.json-or-raw> [threshold]
       bench_diff.py --headline <bench.json-or-raw>

Accepts either the driver's BENCH_r{N}.json wrapper (reads the
`tail` field for the JSON lines) or a raw file containing the two
`{"metric": ...}` lines Bench prints.  Prints per-query old/new/ratio
for every query whose ratio exceeds the threshold (default 1.25) in
either direction, plus totals.

--headline emits the one markdown line STATUS.md quotes as its bench
headline, derived from the committed artifact — round-11 and round-10
both shipped hand-typed headline numbers that drifted from the
artifact; prose generated from the file cannot.
"""
import json
import re
import sys


def per_query(path: str) -> dict:
    text = open(path).read()
    try:
        wrapper = json.loads(text)
        if isinstance(wrapper, dict) and "tail" in wrapper:
            text = wrapper["tail"]
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if '"metric":"per_query"' in line.replace(" ", ""):
            m = re.search(r"\{.*\}", line)
            return json.loads(m.group(0))["queries"]
    # Driver artifacts keep only the output TAIL, which truncates the
    # long per_query line mid-way — fall back to the compact final
    # line (total + short-key queries map), which Bench sizes to
    # always survive the tail.
    for line in reversed(lines_of(path).splitlines()):
        line = line.strip()
        if '"metric":"total"' in line.replace(" ", "") and '"queries"' in line:
            m = re.search(r"\{.*\}", line)
            return json.loads(m.group(0))["queries"]
    raise SystemExit(f"no per_query line found in {path}")


def short_keys(queries: dict) -> dict:
    """Normalize query names to their unique qNN/pNN prefix so a
    full-name artifact (BENCH_SELF) can be diffed against a compact
    short-key one (driver tails); collisions keep the full name —
    same rule Bench itself applies when emitting the compact line."""
    pref = {}
    for name in queries:
        pref.setdefault(name.split("_")[0], []).append(name)
    return {(name.split("_")[0] if len(pref[name.split("_")[0]]) == 1
             else name): sec for name, sec in queries.items()}


def calibration_median(path: str):
    """Window-calibration median from the artifact's total line, or
    None for pre-r16 artifacts that carry no calibration fields."""
    for line in lines_of(path).splitlines():
        line = line.strip()
        if '"metric":"total"' in line.replace(" ", ""):
            m = re.search(r"\{.*\}", line)
            cal = json.loads(m.group(0)).get("calibration")
            return cal["median"] if cal else None
    return None


def lines_of(path: str) -> str:
    text = open(path).read()
    try:
        wrapper = json.loads(text)
        if isinstance(wrapper, dict) and "tail" in wrapper:
            text = wrapper["tail"]
    except json.JSONDecodeError:
        pass
    return text


def headline(path: str) -> None:
    for line in lines_of(path).splitlines():
        line = line.strip()
        if '"metric":"total"' in line.replace(" ", ""):
            m = re.search(r"\{.*\}", line)
            d = json.loads(m.group(0))
            sf = d.get("sf", "?")
            cal = d.get("calibration")
            cal_txt = (f" Window calibration median "
                       f"{cal['median']:.3f} s." if cal else "")
            print(f"**Bench ({path}): {d['value']:.3f} s total over "
                  f"{d['n_queries']} queries, {d['n_failed']} failed "
                  f"(min-of-{d['passes']}, sf dir `{sf}`).**{cal_txt}")
            return
    raise SystemExit(f"no total line found in {path}")


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__.strip().split("\n\n")[1])
    if sys.argv[1] == "--headline":
        headline(sys.argv[2])
        return
    old_path, new_path = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    old, new = short_keys(per_query(old_path)), short_keys(per_query(new_path))
    # Self-calibration (r16): when BOTH artifacts carry the measured
    # window-calibration median, normalize every ratio by the window
    # factor cal_new/cal_old before flagging — a measured gauge, not
    # the suite-median inference that under-corrects for sub-second
    # queries. Pre-r16 artifacts fall back to raw ratios (factor 1).
    cal_old, cal_new = calibration_median(old_path), calibration_median(new_path)
    window = cal_new / cal_old if cal_old and cal_new else 1.0
    if window != 1.0:
        print(f"window calibration: {cal_old:.3f}s -> {cal_new:.3f}s "
              f"(factor {window:.2f}x); ratios below are "
              f"calibration-normalized")
    common = sorted(set(old) & set(new))
    drifted = []
    for q in common:
        a, b = old[q], new[q]
        if a <= 0 or b <= 0:
            continue
        ratio = b / a / window
        if ratio > thr or ratio < 1 / thr:
            drifted.append((q, a, b, ratio))
    drifted.sort(key=lambda x: -x[3])
    for q, a, b, r in drifted:
        print(f"{'SLOWER' if r > 1 else 'faster':6s} {q:28s} "
              f"{a:7.3f}s -> {b:7.3f}s  ({r:.2f}x)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new queries: {', '.join(only_new)}")
    print(f"== {len(common)} common, {len(drifted)} drifted past "
          f"{thr}x{' (normalized)' if window != 1.0 else ''}; totals "
          f"{sum(old[q] for q in common):.1f}s -> "
          f"{sum(new[q] for q in common):.1f}s ==")


if __name__ == "__main__":
    main()
