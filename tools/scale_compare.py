#!/usr/bin/env python3
"""Compare an sf1 bench run against best-known sf0.1 history.

Usage: python3 tools/scale_compare.py <sf1_bench_json_line_file>

For every query: sf1 seconds vs best sf0.1 seconds across
BENCH_HISTORY.jsonl (sf0.1 entries only), the ratio, and a flag when
sf1 > LIMIT x (10 x sf0.1_best) -- i.e. worse than 2x the linear
10x-extrapolated cost (VERDICT r7 criterion). Fixed per-query harness
overhead (session, streaming checkpoints) makes ratios far BELOW 10
common and fine; the flags are the superlinear suspects to audit.
"""
import json, re, sys

LIMIT = 2.0


def load_queries(line):
    d = json.loads(line)
    return d.get("queries", {}), d


def main():
    with open(sys.argv[1]) as f:
        txt = f.read()
    m = [ln for ln in txt.splitlines() if ln.startswith('{"metric"')]
    sf1_q, sf1 = load_queries(m[-1])

    best = {}
    with open("BENCH_HISTORY.jsonl") as f:
        for ln in f:
            try:
                d = json.loads(ln)
            except Exception:
                continue
            if d.get("sf") != "/root/testdata/sf0.1":
                continue
            for k, v in d.get("queries", {}).items():
                if v and v > 0 and (k not in best or v < best[k]):
                    best[k] = v

    rows = []
    for k, v in sorted(sf1_q.items()):
        b = best.get(k)
        if not b:
            rows.append((k, v, None, None, ""))
            continue
        ratio = v / b
        flag = "FLAG" if v > LIMIT * 10 * b else ""
        rows.append((k, v, b, ratio, flag))

    total_sf1 = sum(v for _, v, *_ in rows)
    flagged = [r for r in rows if r[4]]
    print(f"{'query':36s} {'sf1':>8s} {'sf0.1best':>9s} {'ratio':>7s}")
    for k, v, b, ratio, flag in sorted(
            rows, key=lambda r: -(r[3] or 0)):
        bs = f"{b:9.2f}" if b else "      n/a"
        rs = f"{ratio:7.2f}" if ratio else "    n/a"
        print(f"{k:36s} {v:8.2f} {bs} {rs} {flag}")
    print(f"\nsf1 total: {total_sf1:.1f}s over {len(rows)} queries; "
          f"calib: {sf1.get('calib')}")
    print(f"flagged (> {LIMIT}x linear 10x extrapolation): "
          f"{[r[0] for r in flagged]}")


if __name__ == "__main__":
    main()
