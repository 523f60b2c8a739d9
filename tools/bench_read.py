#!/usr/bin/env python3
"""The round-over-round bench read, mechanized (VERDICT r10 #5/#6/#7,
dual-control adjudication r12 — VERDICT r11 #1).

Input: two BENCH_DETAIL.json files (previous round's committed one, this
round's fresh one). Output: the adjudication table the bench notes
record —

  1. CONTROL pair first: boot control (td_token_stats) and CPU control
     (range_modsq_fold_1b) ratios. A sick boot/CPU discounts every raw
     flag below (the r10 three-boot study: common-query ratios banded
     1.049-1.19x across plan-identical boots).
  2. Common-query totals, raw AND normalized. >1.3x moves are
     adjudicated on the NORMALIZED numbers: a move that survives
     normalization is plan-shaped; one that normalizes away was the
     boot.
  3. DUAL-CONTROL rule (r12): the r11 boot proved the CPU-only
     normalizer misclassifies IO/page-cache-shaped smears — its boot
     control read 1.77x while the CPU control read 1.33x, and ~90
     untouched queries got stamped "PLAN-SHAPED". When the two control
     ratios disagree by >1.2x, every flag is normalized by BOTH
     controls and the verdict says which classifier fired:
     PLAN-SHAPED only when the move survives BOTH normalizers; a move
     either control explains is a smear, not a plan change.
  4. Forced-to-forced block for the 17 elision-affected queries
     (VERDICT r10 #6) — same normalization, same 1.3x gate.
  5. The standing watchlist (r10 band-noise flags) re-checked against
     their r9 anchors explicitly.

Rounds predating the control_cpu block (or arg-filtered runs without
SPARK_GRAFT_CPU_CONTROL=1) are handled: normalization falls back to the
boot control alone, or is skipped with a printed note (ADVICE r11 #4).

Usage: bench_read.py PREV.json CURR.json [--watch q=anchor ...]
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def median_sec(block):
    """Control median or None when the block / its 'sec' is absent."""
    if not isinstance(block, dict):
        return None
    v = block.get("sec")
    return float(v) if isinstance(v, (int, float)) and v > 0 else None


def main():
    prev_p, curr_p = sys.argv[1], sys.argv[2]
    watch = {}
    for a in sys.argv[3:]:
        if a.startswith("--watch"):
            continue
        q, v = a.split("=")
        watch[q] = float(v)
    prev, curr = load(prev_p), load(curr_p)

    pb = median_sec(prev.get("control"))
    cb = median_sec(curr.get("control"))
    pc = median_sec(prev.get("control_cpu"))
    cc = median_sec(curr.get("control_cpu"))
    boot_ratio = (cb / pb) if (pb and cb) else None
    cpu_ratio = (cc / pc) if (pc and cc) else None
    print("== controls ==")
    print(f"boot  {pb} -> {cb}  ratio "
          + (f"{boot_ratio:.2f}" if boot_ratio else "n/a (missing)"))
    print(f"cpu   {pc} -> {cc}  ratio "
          + (f"{cpu_ratio:.2f}" if cpu_ratio else "n/a (missing)"))

    controls_disagree = (boot_ratio and cpu_ratio and
                         max(boot_ratio, cpu_ratio)
                         / min(boot_ratio, cpu_ratio) > 1.2)
    if controls_disagree:
        print(f"CONTROLS DISAGREE >1.2x (boot {boot_ratio:.2f} vs cpu "
              f"{cpu_ratio:.2f}): IO/page-cache-shaped smear likely — "
              f"flags below adjudicated by BOTH normalizers; PLAN-SHAPED "
              f"only when a move survives both.")
    normalizers = [(name, r) for name, r in
                   (("cpu", cpu_ratio), ("boot", boot_ratio)) if r]
    if not normalizers:
        print("note: no usable control on one side — flags below are RAW "
              "only and cannot be adjudicated (treat as boot-suspect).")

    pq, cq = prev["queries"], curr["queries"]
    common = sorted(q for q in set(pq) & set(cq)
                    if pq[q] is not None and cq[q] is not None)
    pt = sum(pq[q] for q in common if pq[q] >= 0)
    ct = sum(cq[q] for q in common if cq[q] >= 0)
    print(f"\n== common {len(common)} queries ==")
    if pt > 0:
        print(f"raw total {pt:.1f} -> {ct:.1f}  ratio {ct / pt:.3f}")
        for name, r in normalizers:
            print(f"{name}-normalized total ratio {ct / pt / r:.3f}")
    else:
        print("no common positive-time queries — nothing to compare")

    def verdict_for(raw):
        """Adjudicate one >1.3x raw move against every available
        normalizer; returns (verdict, detail)."""
        if not normalizers:
            return "UNADJUDICATED (no control)", ""
        reads = [(name, raw / r) for name, r in normalizers]
        detail = " ".join(f"{name}-adj {v:.2f}x" for name, v in reads)
        surviving = [name for name, v in reads if v > 1.3]
        if len(surviving) == len(reads):
            return "PLAN-SHAPED (survives all normalizers)", detail
        if surviving:
            cleared = [n for n, v in reads if v <= 1.3]
            return (f"smear-ambiguous ({'/'.join(surviving)} flags, "
                    f"{'/'.join(cleared)} clears — boot-suspect)"), detail
        return "boot (normalizes away)", detail

    print("\n== >1.3x raw flags, adjudicated ==")
    flags = []
    for q in common:
        if pq[q] <= 0 or cq[q] < 0:
            continue
        raw = cq[q] / pq[q]
        if raw > 1.3 and cq[q] - pq[q] > 0.15:  # ignore sub-150ms jitter
            v, detail = verdict_for(raw)
            flags.append((q, pq[q], cq[q], raw, detail, v))
    for q, a, b, raw, detail, v in sorted(flags, key=lambda x: -x[3]):
        print(f"  {q}: {a:.2f} -> {b:.2f}  raw {raw:.2f}x  {detail}  {v}")
    if not flags:
        print("  none")

    pf, cf = prev.get("forced", {}), curr.get("forced", {})
    if pf and cf:
        commonf = sorted(set(pf) & set(cf))
        pft = sum(pf[q] for q in commonf if pf[q] >= 0)
        cft = sum(cf[q] for q in commonf if cf[q] >= 0)
        print(f"\n== forced-to-forced ({len(commonf)} queries) ==")
        if pft > 0:
            print(f"total {pft:.1f} -> {cft:.1f}  ratio {cft / pft:.3f}")
        for q in commonf:
            if pf[q] <= 0 or cf[q] < 0:
                continue
            raw = cf[q] / pf[q]
            if raw > 1.3 and cf[q] - pf[q] > 0.15:
                v, detail = verdict_for(raw)
                print(f"  {q}: {pf[q]:.2f} -> {cf[q]:.2f}  raw {raw:.2f}x  "
                      f"{detail}  {v}")

    if watch:
        print("\n== watchlist vs anchors ==")
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
