#!/usr/bin/env python3
"""Mechanical decade census over two versioned BENCH artifacts.

Executes the BASELINE.md adjudication rule (r14 verdict #5 asked for
this to stop being a per-round manual exercise): join two artifacts'
per-query seconds AND io byte fields, compute ratios, and classify
every row —

  - seconds ratio ~ bytes ratio (within `slack`)  -> "tracks-io":
    the work grew with the data, the expected shape;
  - seconds inflate while shuffle/spill/input bytes stay FLAT
    -> "page-cache": single-node cache/contention class, NOT a plan
    regression (the r13-s2 22-row manual adjudication, mechanized);
  - shuffle or spill bytes grow SUPERLINEARLY vs the declared data
    ratio -> "plan-regression?": a real plan defect candidate, the
    only class worth a human look.

Usage:
  decade_census.py <bench_a.json> <bench_b.json> [--data-ratio N]
      [--min-sec S] [--top K]

bench_a is the smaller SF (denominator). --data-ratio defaults to 10
(adjacent decades). Rows with a-seconds < --min-sec (default 0.5) are
excluded from the census medians (scheduling-floor noise) but still
classified. Output: a summary line plus the worst rows per class.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.read().strip() or "{}")
    return d


def main():
    # accept both --opt=value and the documented --opt value form
    args, opts, argv = [], {}, sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--"):
            if "=" in a:
                k, v = a.split("=", 1)
                opts[k] = v
            elif i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                opts[a] = argv[i + 1]
                i += 1
            else:
                opts[a] = True
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        sys.exit(__doc__)
    a, b = load(args[0]), load(args[1])
    data_ratio = float(opts.get("--data-ratio", 10))
    min_sec = float(opts.get("--min-sec", 0.5))
    top = int(opts.get("--top", 8))
    qa, qb = a.get("queries", {}), b.get("queries", {})
    ioa, iob = a.get("io", {}), b.get("io", {})
    common = sorted(set(qa) & set(qb))
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))

    def iosum(io, keys):
        return sum(io.get(k, 0) for k in keys)

    WORK = ("shuffle_read", "shuffle_write", "input")
    SPILL = ("spill_mem", "spill_disk")
    rows = []
    for q in common:
        sa, sb = qa[q], qb[q]
        if sa < 0 or sb < 0:
            rows.append((q, None, None, None, "failed-row"))
            continue
        ia, ib = ioa.get(q, {}), iob.get(q, {})
        wa, wb = iosum(ia, WORK), iosum(ib, WORK)
        spa, spb = iosum(ia, SPILL), iosum(ib, SPILL)
        sec_r = sb / sa if sa > 0 else float("inf")
        byte_r = (wb / wa) if wa > 0 else (float("inf") if wb > 0 else 1.0)
        # classification
        if spb > 0 and spa == 0 and spb > 1 << 28:
            cls = "plan-regression? (new spill)"
        elif wa > 1 << 24 and byte_r > 3.0 * data_ratio:
            cls = "plan-regression? (superlinear bytes)"
        elif sec_r > 2.0 and byte_r < 1.3:
            cls = "page-cache"
        else:
            cls = "tracks-io"
        rows.append((q, sec_r, byte_r, (sa, sb, wa, wb, spa, spb), cls))

    censusable = [r for r in rows if r[1] is not None
                  and r[3][0] >= min_sec]
    med = lambda xs: sorted(xs)[len(xs) // 2] if xs else float("nan")
    sec_med = med([r[1] for r in censusable])
    byte_med = med([r[2] for r in censusable if r[2] != float("inf")])
    print(f"artifacts: A={args[0]} (commit {a.get('commit','?')[:12]}, "
          f"sf={a.get('sf','?')}) B={args[1]} "
          f"(commit {b.get('commit','?')[:12]}, sf={b.get('sf','?')})")
    print(f"common rows: {len(common)}  a-only: {only_a or '[]'}  "
          f"b-only: {only_b or '[]'}")
    print(f"declared data ratio: {data_ratio}x   census rows "
          f"(A >= {min_sec}s): {len(censusable)}")
    print(f"MEDIAN seconds ratio: {sec_med:.2f}x   "
          f"MEDIAN work-bytes ratio: {byte_med:.2f}x")
    by_cls = {}
    for r in rows:
        by_cls.setdefault(r[4], []).append(r)
    for cls in sorted(by_cls):
        members = by_cls[cls]
        print(f"\n[{cls}] {len(members)} rows")
        if cls == "tracks-io":
            continue  # the expected class: count only
        worst = sorted([m for m in members if m[1] is not None],
                       key=lambda m: -(m[1] or 0))[:top]
        for q, sec_r, byte_r, d, _ in worst:
            sa, sb, wa, wb, spa, spb = d
            print(f"  {q:28s} sec {sa:8.1f}->{sb:8.1f} ({sec_r:6.2f}x)  "
                  f"work-bytes {wa >> 20:7d}->{wb >> 20:7d} MB "
                  f"({byte_r:6.2f}x)  spill {spa >> 20}->{spb >> 20} MB")
    bad = [r for r in rows if r[4].startswith("plan-regression")]
    print(f"\nVERDICT: {len(bad)} plan-regression candidate(s)"
          + (": " + ", ".join(r[0] for r in bad) if bad else
             " — every inflated row is page-cache or tracks its bytes"))
    # machine-readable flagged-row list so a sweep script can re-run
    # the page-cache class solo (min-of-2) without prose adjudication
    if "--emit-flagged" in opts:
        flagged = {
            "page_cache": sorted(r[0] for r in rows if r[4] == "page-cache"),
            "plan_regression": sorted(r[0] for r in bad),
            "failed": sorted(r[0] for r in rows if r[4] == "failed-row"),
        }
        with open(opts["--emit-flagged"], "w") as f:
            json.dump(flagged, f, indent=1)
        print(f"flagged-row list written to {opts['--emit-flagged']}")


if __name__ == "__main__":
    main()
