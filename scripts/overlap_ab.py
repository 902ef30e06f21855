"""Fixed-corpus A/B for overlapped bucket pipelines (VERDICT r4 #5 done-bar).

Same corpus, same width, n_buckets=4; the ONLY variable is
build_index(bucket_concurrency=1 vs 2). Each leg is a fresh subprocess
session (the scaling-campaign measurement model) bracketed by the shared
memcpy weather probes; the report uses best-of-CLEAN per arm and writes
BENCH/OVERLAP_AB.md.

Usage:
    python scripts/overlap_ab.py [n_docs=200000] [cores=8] [reps=3]

Do NOT run concurrently with campaign legs (two Spark jobs poison each
other's walls AND probes).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from information_retrieval_images_spark.weather import bw_probe  # noqa: E402

OUT = os.path.join(REPO, "BENCH", "OVERLAP_AB.md")
RUNS = os.path.join(REPO, "BENCH", "overlap_ab_runs.jsonl")
GATE = float(os.environ.get("GATE", "40"))

WORKER = r"""
import json, shutil, sys, time, os
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_SHUFFLE"] = str({cores})
from information_retrieval_images_spark.session import get_spark
from information_retrieval_images_spark.catalog import Catalog
from information_retrieval_images_spark.operators.index_build import build_index

spark = get_spark(master="local[{cores}]", app_name="overlap-ab-{conc}",
                  extra_conf={{"spark.local.dir": "/dev/shm/ir_ab_tmp"}})
spark.range(10000).repartition({cores}).mapInPandas(lambda it: it, schema="id long").count()
pages = spark.read.parquet({corpus!r})
wh = "/dev/shm/ir_ab_wh"
shutil.rmtree(wh, ignore_errors=True)
cat = Catalog(spark, wh)
t0 = time.time()
m = build_index(spark, pages, cat, lang="en", n_buckets=4,
                num_term_partitions={cores}, bucket_concurrency={conc})
dt = time.time() - t0
spark.stop()
print("RESULT " + json.dumps({{"conc": {conc}, "cores": {cores},
    "build_s": round(dt, 2), "docs": m["n_docs"],
    "docs_per_sec": round(m["n_docs"] / dt, 1)}}))
shutil.rmtree(wh, ignore_errors=True)
shutil.rmtree("/dev/shm/ir_ab_tmp", ignore_errors=True)
"""


def leg(conc: int, cores: int, corpus: str) -> dict:
    code = WORKER.format(repo=REPO, cores=cores, conc=conc, corpus=corpus)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=2400,
        start_new_session=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(out.stdout[-1500:] + out.stderr[-2500:])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    corpus = f"/dev/shm/ir_bench_corpus_{n_docs}_k64"
    if not os.path.isdir(corpus):
        raise SystemExit(f"corpus missing: {corpus} (run the campaign's ensure_corpus first)")
    rows: list[dict] = []
    # interleave arms so weather drift decorrelates from the treatment
    for rep in range(reps):
        for conc in (1, 2):
            pre = bw_probe(8, 2.5)
            if pre < GATE:
                rows.append({"skipped_weather": True, "conc": conc, "probe_pre": pre, "rep": rep})
                print(json.dumps(rows[-1]), flush=True)
                time.sleep(25)
                continue
            r = leg(conc, cores, corpus)
            time.sleep(20)  # teardown settle before the closing bracket
            r.update({"probe_pre": pre, "probe_post": bw_probe(8, 2.5), "rep": rep,
                      "ts": time.strftime("%Y-%m-%d %H:%M:%S")})
            rows.append(r)
            print(json.dumps(r), flush=True)
            time.sleep(10)
    with open(RUNS, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    report(cores, n_docs)


def report(cores: int, n_docs: int) -> None:
    rows = [json.loads(l) for l in open(RUNS)] if os.path.exists(RUNS) else []
    md = [
        "# Overlapped bucket pipelines: fixed-corpus A/B\n",
        f"\nSame corpus ({n_docs:,} docs, 64 KB pages), same width (local[{cores}]),"
        " n_buckets=4; the only variable is build_index(bucket_concurrency=1 vs 2)."
        " Fresh subprocess session per leg; CLEAN = both bracket probes >= "
        f"{GATE} GB/s (information_retrieval_images_spark.weather). Raw samples:"
        " BENCH/overlap_ab_runs.jsonl.\n",
        "\n| conc | rep | build_s | probe pre/post (GB/s) | clean |\n|---|---|---|---|---|\n",
    ]
    best: dict[int, float] = {}
    for r in rows:
        if r.get("skipped_weather"):
            md.append(f"| {r['conc']} | {r['rep']} | (pre-skipped) | {r['probe_pre']}/- | - |\n")
            continue
        clean = min(r["probe_pre"], r["probe_post"]) >= GATE
        md.append(
            f"| {r['conc']} | {r['rep']} | {r['build_s']} | "
            f"{r['probe_pre']}/{r['probe_post']} | {'yes' if clean else 'no'} |\n"
        )
        if clean and (r["conc"] not in best or r["build_s"] < best[r["conc"]]):
            best[r["conc"]] = r["build_s"]
    if 1 in best and 2 in best:
        shrink = (best[1] - best[2]) / best[1] * 100
        md.append(
            f"\n**Best-of-clean: serial {best[1]}s vs overlapped {best[2]}s "
            f"-> {shrink:+.1f}% wall ({'-' if shrink > 0 else '+'}"
            f"{abs(best[1] - best[2]):.1f}s of the per-build serial tail removed "
            "at fixed corpus and width).**\n"
        )
    else:
        md.append("\n(not enough clean samples in both arms yet)\n")
    with open(OUT, "w") as f:
        f.write("".join(md))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
