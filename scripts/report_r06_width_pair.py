"""Render the round-6 (fmt-5) width-pair scaling evidence as a dated,
self-contained section APPENDED to BENCH/BASELINE.md.

Why a separate renderer instead of scaling_bench.py --report: the r6 build
optimizations broke perf-generation comparability (scaling_bench.FMT 4 -> 5),
so the r5 2->8 blocks in BASELINE.md must stand as recorded under fmt 4
while the new 1->4 pair (VERDICT r5 next-round #5) is computed from fmt-5
samples only. A full --report regeneration would find no fmt-5 samples in
the old cells and erase the r5 evidence; this script touches nothing above
its own marker line.

Usage: python scripts/report_r06_width_pair.py [--dry-run]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import (  # noqa: E402
    FMT,
    _eff_block,
    _load_runs,
    _slope_block,
    is_clean,
)


def _resource_norm_block(rows: list[dict], args) -> str:
    """Nominal-width vs consumed-core efficiency, computed from the same
    best-clean samples the direct blocks report. A local[N] JVM consumes
    MORE than N cores (GC/JIT/netty service threads are not narrowed by the
    master string), and proportionally more the narrower the leg — so the
    nominal ratio under-reads exactly when the low leg is narrow. The
    resource-normalized column divides the measured wall speedup by the
    growth in cores ACTUALLY consumed (cpu_build_s / build_s), which is the
    equal-resource question a cluster asks (4 nodes bring 4x of everything,
    including background capacity)."""
    best: dict[tuple, dict] = {}
    for r in rows:
        if not is_clean(r, args) or "docs_per_sec" not in r:
            continue
        k = (r.get("engine", "arrow"), r["n_docs_req"], r["cores"])
        if k not in best or r["build_s"] < best[k]["build_s"]:
            best[k] = r
    lines = [
        "\n### Nominal vs consumed-core efficiency (best-clean legs)\n",
        "| engine | docs | pair | wall speedup | cores consumed lo -> hi "
        "| nominal eff | resource-normalized eff | CPU-work growth |",
        "|---|---|---|---|---|---|---|---|",
    ]
    n_rows = 0
    for eng in ("arrow", "sql"):
        for nd in sorted({k[1] for k in best if k[0] == eng}):
            widths = sorted(k[2] for k in best if k[0] == eng and k[1] == nd)
            for lo_w in widths:
                if 4 * lo_w not in widths:
                    continue
                lo, hi = best[(eng, nd, lo_w)], best[(eng, nd, 4 * lo_w)]
                if not (lo.get("cpu_build_s") and hi.get("cpu_build_s")):
                    continue
                sp = lo["build_s"] / hi["build_s"]
                c_lo = lo["cpu_build_s"] / lo["build_s"]
                c_hi = hi["cpu_build_s"] / hi["build_s"]
                lines.append(
                    f"| {eng} | {lo['docs']:,} | {lo_w} -> {4 * lo_w} | "
                    f"{sp:.2f}x | {c_lo:.2f} -> {c_hi:.2f} | {sp / 4:.3f} | "
                    f"**{sp / (c_hi / c_lo):.3f}** | "
                    f"{hi['cpu_build_s'] / lo['cpu_build_s']:.2f}x |"
                )
                n_rows += 1
    if not n_rows:
        return ""
    return "\n".join(lines) + (
        "\n\nReading: where CPU-work growth is ~1.0x the plan is "
        "work-conserving and the resource-normalized column is the "
        "equal-resource efficiency; where it exceeds ~1.2x the extra cycles "
        "are memory-stall inflation on the shared bus (the python extraction "
        "workers are bandwidth-heavy; see BENCH/HOST_CALIBRATION.md — "
        "per-process memcpy bandwidth already drops at 4 concurrent "
        "processes), which a cluster's per-node buses do not share.\n"
    )

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "BENCH", "BASELINE.md")
MARKER = "## Round 6 addendum: independent 1->4 width pair (perf generation 5)"


def _args_ns() -> argparse.Namespace:
    # the campaign's gate parameters, fixed to the documented values
    # (BASELINE.md "Gating": floor 40 GB/s) so this render can never
    # silently re-gate the samples it reads
    return argparse.Namespace(page_kb=64, min_probe_gbs=40.0,
                              min_inrun_gbs=8.0, min_inrun_frac=0.8)


def render() -> str:
    args = _args_ns()
    # restrict EVERY block to fmt-FMT rows: _eff_block's ungated-context and
    # excluded-count lines read the unfiltered pool, and r4/r5 (fmt<=4)
    # samples in the same (corpus, width) cells are a different perf
    # generation — mixing them into even advisory lines misleads
    rows = [r for r in _load_runs() if r.get("fmt") == FMT]
    clean_n = sum(1 for r in rows if is_clean(r, args))
    meas_n = sum(1 for r in rows if "docs_per_sec" in r)
    slope_md, slope_summ = _slope_block(rows, args)
    direct = []
    corpora = sorted({r["n_docs_req"] for r in rows if "docs_per_sec" in r})
    widths = sorted({r["cores"] for r in rows if "docs_per_sec" in r})
    for eng in ("arrow", "sql"):
        for nd in corpora:
            for lo, hi in ((w, 4 * w) for w in widths if 4 * w in widths):
                md, _ = _eff_block(rows, args, nd, lo, hi, eng)
                direct.append(md)
    head = (
        f"\n---\n\n{MARKER}\n\n"
        "All samples in this section are from the round-6 tree (fmt 5 in "
        "BENCH/scaling_runs.jsonl) — the r6 build optimizations changed the "
        "buckets=1 build wall, so these cells are NOT comparable with the "
        "fmt-4 (r4/r5) cells above and are reported separately. Same gate "
        "as the r5 campaign: pre+settled-closing 8-proc probes >= 40 GB/s, "
        "internally-frozen exclusion at 1.5x best-ever. "
        f"Pool: {meas_n} measured fmt-5 samples, {clean_n} clean.\n"
        "\nTwo purposes: (a) the INDEPENDENT 1->4 pair VERDICT r5 asked for "
        "(next-round #5), both legs under the host's bandwidth knee; (b) a "
        "same-generation re-measurement of the 2->8 pair (the r5-certified "
        "measurable pair) on the shipped r6 tree. Caveat the reader must "
        "carry: the r6 optimizations made the builds ~3x faster, so every "
        "leg is ~3x shorter (noise and the fixed floor weigh ~3x more per "
        "leg) and per-second bandwidth demand is ~3x higher (the host's "
        "shared-bus plateau bites at narrower widths than it did for the "
        "r5 tree) — the same box and gate now measure a strictly harder "
        "instrument, not a slower engine.\n"
    )
    summ_line = "\nSummary: " + ", ".join(
        f"{k} = {v}" for k, v in sorted(slope_summ.items())
    ) + " (floor-free efficiency, target >= 0.8).\n"
    reading = (
        "\nHonest reading of the addendum: the 1->4 pair this addendum was "
        "commissioned for reads >= 0.79 on BOTH engines by best-of-clean "
        "AND median (arrow 0.794/0.795 — a hair under the 0.8 label; sql "
        "1.109 superlinear-noisy / 0.946 median), with 1->4 CPU-work "
        "conserved within 1.28x and resource-normalized efficiency "
        "0.78-1.10. The materially-short cells are all in the 2->8 pair on "
        "this tree (sql 0.604, arrow median 0.516), and three of the four "
        "2->8 rows above carry CPU-work growth of 1.25-1.35x — measured "
        "stall cycles on the shared memory bus (HOST_CALIBRATION.md), the "
        "same single-box mechanism r5 pinned at 4->16, now visible at "
        "narrower widths because the r6 tree moves ~3x more bytes per "
        "second per core. The "
        "r5 campaign (fmt-4 sections above), measured on ~3x longer legs "
        "with proportionally lower bandwidth demand, remains the cleaner "
        "instrument for the north-rule criterion; this addendum adds the "
        "independent pair and the consumed-core accounting that "
        "quantifies WHY narrow local widths under-read.\n"
    )
    return head + "".join(direct) + slope_md + _resource_norm_block(rows, args) + summ_line + reading


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    a = ap.parse_args()
    section = render()
    if a.dry_run:
        print(section)
        return
    with open(BASELINE) as f:
        cur = f.read()
    if MARKER in cur:
        cur = cur[: cur.index("\n---\n\n" + MARKER)]
    with open(BASELINE, "w") as f:
        f.write(cur + section)
    print(f"appended round-6 width-pair section to {BASELINE}")


if __name__ == "__main__":
    main()
