#!/usr/bin/env python3
"""The round-over-round bench read, mechanized (VERDICT r10 #5/#6/#7).

Input: two BENCH_DETAIL.json files (previous round's committed one, this
round's fresh one). Output: the adjudication table the bench notes
record —

  1. CONTROL pair first: boot control (td_token_stats) and CPU control
     (range_modsq_fold_1b) ratios. A sick boot/CPU discounts every raw
     flag below (the r10 three-boot study: common-query ratios banded
     1.049-1.19x across plan-identical boots).
  2. Common-query totals, raw AND cpu-normalized (query_median /
     same-boot cpu-control median — the queries_cpu_normalized block).
     >1.3x moves are adjudicated on the NORMALIZED numbers: a move that
     survives normalization is plan-shaped; one that normalizes away
     was the boot.
  3. Forced-to-forced block for the 17 elision-affected queries
     (VERDICT r10 #6) — same normalization, same 1.3x gate.
  4. The standing watchlist (r10 band-noise flags) re-checked against
     their r9 anchors explicitly.

Usage: bench_read.py PREV.json CURR.json [--watch q=anchor ...]
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    prev_p, curr_p = sys.argv[1], sys.argv[2]
    watch = {}
    for a in sys.argv[3:]:
        if a.startswith("--watch"):
            continue
        q, v = a.split("=")
        watch[q] = float(v)
    prev, curr = load(prev_p), load(curr_p)

    pc, cc = prev.get("control", {}), curr.get("control", {})
    pcpu, ccpu = prev.get("control_cpu", {}), curr.get("control_cpu", {})
    print(f"== controls ==")
    print(f"boot  {pc.get('sec')} -> {cc.get('sec')}  "
          f"ratio {cc.get('sec', 0) / max(pc.get('sec', 1), 1e-9):.2f}")
    cpu_ratio = ccpu.get("sec", 0) / max(pcpu.get("sec", 1), 1e-9)
    print(f"cpu   {pcpu.get('sec')} -> {ccpu.get('sec')}  ratio {cpu_ratio:.2f}")

    pq, cq = prev["queries"], curr["queries"]
    common = sorted(set(pq) & set(cq))
    pt = sum(pq[q] for q in common if pq[q] >= 0)
    ct = sum(cq[q] for q in common if cq[q] >= 0)
    print(f"\n== common {len(common)} queries ==")
    print(f"raw total {pt:.1f} -> {ct:.1f}  ratio {ct / pt:.3f}")

    pn = prev.get("queries_cpu_normalized")
    cn = curr.get("queries_cpu_normalized")
    if pn and cn:
        pnt = sum(pn[q] for q in common if q in pn)
        cnt = sum(cn[q] for q in common if q in cn)
        print(f"normalized total {pnt:.1f} -> {cnt:.1f}  ratio {cnt / pnt:.3f}")
    else:
        # previous round predates the normalized block: normalize both
        # sides here from their control_cpu medians (same arithmetic)
        pn = {q: pq[q] / pcpu["sec"] for q in pq if pq[q] >= 0}
        cn = {q: cq[q] / ccpu["sec"] for q in cq if cq[q] >= 0}
        print(f"(prev normalized block derived from control_cpu {pcpu['sec']})")

    print(f"\n== >1.3x raw flags, adjudicated on normalized ==")
    flags = []
    for q in common:
        if pq[q] <= 0 or cq[q] < 0:
            continue
        raw = cq[q] / pq[q]
        if raw > 1.3 and cq[q] - pq[q] > 0.15:  # ignore sub-150ms jitter
            norm = (cn.get(q, 0) / pn.get(q, 1e-9)) if q in pn and q in cn else None
            verdict = ("PLAN-SHAPED" if norm and norm > 1.3 else
                       "boot (normalizes away)" if norm else "no-norm")
            flags.append((q, pq[q], cq[q], raw, norm, verdict))
    for q, a, b, raw, norm, v in sorted(flags, key=lambda x: -x[3]):
        print(f"  {q}: {a:.2f} -> {b:.2f}  raw {raw:.2f}x  "
              f"norm {norm:.2f}x  {v}" if norm else
              f"  {q}: {a:.2f} -> {b:.2f}  raw {raw:.2f}x  {v}")
    if not flags:
        print("  none")

    pf, cf = prev.get("forced", {}), curr.get("forced", {})
    if pf and cf:
        commonf = sorted(set(pf) & set(cf))
        pft = sum(pf[q] for q in commonf if pf[q] >= 0)
        cft = sum(cf[q] for q in commonf if cf[q] >= 0)
        print(f"\n== forced-to-forced ({len(commonf)} queries) ==")
        print(f"total {pft:.1f} -> {cft:.1f}  ratio {cft / pft:.3f}")
        for q in commonf:
            if pf[q] <= 0 or cf[q] < 0:
                continue
            raw = cf[q] / pf[q]
            if raw > 1.3 and cf[q] - pf[q] > 0.15:
                norm = raw / cpu_ratio if cpu_ratio > 0 else raw
                v = "PLAN-SHAPED" if norm > 1.3 else "boot (normalizes away)"
                print(f"  {q}: {pf[q]:.2f} -> {cf[q]:.2f}  raw {raw:.2f}x  "
                      f"cpu-adj {norm:.2f}x  {v}")

    if watch:
        print(f"\n== watchlist vs anchors ==")
        for q, anchor in watch.items():
            v = cq.get(q)
            if v is None:
                print(f"  {q}: missing this round")
                continue
            r = v / anchor
            print(f"  {q}: anchor {anchor:.2f}, now {v:.2f}  ratio {r:.2f}x  "
                  f"{'EXCEEDS 1.3x — treat as real, profile' if r > 1.3 else 'in band'}")


if __name__ == "__main__":
    main()
