#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the
end-to-end transcripts ER pipeline on a deterministic synthetic corpus
(~1M turns at sf 0.1, FIXTURES.md §4), and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Default mode runs $SPARK_GRAFT_REPS reps (default 3) with the rep
loop outer and reports per-query MEDIANS plus the min/max spread —
host drift on this box swings same-code runs ±40% (BENCH.md), so a
single-shot number is not attributable to code. Count invariants
(mentions/pairs/components) are asserted byte-stable across reps.

`--scaling` mode: re-runs the ER pipeline in two subprocesses at
local[N] and local[4N] (sandbox stand-in for N vs 4N executors,
BASELINE.md) and reports throughput + scaling efficiency.
`--pipeline-only N_CPUS` is the internal child mode.
For code-vs-code attribution across git refs, use
scripts/ab_bench.py (interleaved A/B of two checkouts).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q01_pricing_summary",
    "q05_nation_revenue",
    "q_alias_table",
    "q_er_components",
    "q_minhash_signature",
    "q_cosine_topk",
    "q_asof_stable",
    "q_dedup_exact",
    # round-2 plans: the s03 balancing pipeline (multi-stage with the
    # unit-explosion reduction) and the SCD as-of join
    "q_dataset_balance",
    "q_title_scd",
]


def _sf_from_dir(d: str) -> float:
    try:
        return float(d.rstrip("/").rsplit("sf", 1)[1])
    except Exception:  # noqa: BLE001
        return 0.1


def run_pipeline_bench(spark, sf: float, scale_mult: int = 1, profile: bool = True) -> dict:
    """Transcripts ER pipeline at a corpus size proportional to sf
    (sf 0.1 → ~125k convs ≈ 1M turns). Returns timing + pair counts.

    scale_mult: extra multiplier used by --scaling so the N-core run is
    actually saturated (a corpus the 4N config finishes in scheduler
    overhead can't evidence scaling)."""
    from pyspark.sql import functions as F

    from tempel_spark.plans.pipeline import run_pipeline
    from tempel_spark.synth import synth_transcripts

    n_convs = max(200, int(1_250_000 * sf) * scale_mult)
    n_entities = max(64, n_convs // 250)
    snaps = [f"{y}-01-01 00:00:00" for y in (2013, 2014, 2015, 2016)]
    trans = synth_transcripts(spark, n_convs=n_convs, n_entities=n_entities, n_snapshots=3)

    t0 = time.time()
    # profile=True: each stage is eagerly materialized inside
    # run_pipeline with its own wall clock — true per-stage
    # attribution for round-over-round regressions (the CC driver
    # loop would otherwise pull all upstream compute into one stage)
    res = run_pipeline(spark, trans, snapshots=snaps, pair_cap=150, profile=profile)
    stages = dict(res.get("timings", {}))
    n_pairs = res["scored"].count()
    t_score = time.time() - t0
    # one action for both output metrics (driver-side planning is the
    # serial fraction — merge actions wherever possible)
    row = res["components"].agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("component").alias("c")
    ).collect()[0]
    n_mentions, n_comp = row["n"], row["c"]
    t_total = time.time() - t0
    return {
        "n_convs": n_convs,
        "n_mentions": n_mentions,
        "n_pairs_scored": n_pairs,
        "pairs_scored_per_sec": round(n_pairs / max(t_score, 1e-9), 1),
        "mentions_per_sec": round(n_mentions / max(t_total, 1e-9), 1),
        "sec_to_scored": round(t_score, 3),
        "sec_total": round(t_total, 3),
        "stages": stages,
        "n_components": n_comp,
    }


def med(xs: list[float]) -> float:
    """Median rounded to ms — shared by the headline bench and the
    scaling-evidence legs so the two paths can never diverge."""
    s = sorted(xs)
    m = len(s) // 2
    return round(s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2, 3)


def main() -> None:
    from tempel_spark.session import get_spark

    sf = _sf_from_dir(SF_DIR)

    if "--pipeline-only" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--pipeline-only") + 1])
        mult = int(os.environ.get("TEMPEL_SCALE_MULT", "1"))
        # 4 shuffle partitions per core: fine enough that AQE's skew
        # split can break a hot block across task slots (2 partitions
        # at the 2-core leg hides skew that then bites the wide leg);
        # AQE coalescing merges the small stages back down.
        spark = get_spark(
            f"bench_pipe_{cpus}", cpus=cpus, shuffle_partitions=4 * cpus,
            extra_conf={"spark.default.parallelism": str(2 * cpus)},
        )
        # warmup at 1/50 size: python UDF workers fork + import, JIT
        # compiles — steady-state throughput is what a long-running
        # cluster job sees, so that's what the scaling ratio measures.
        # profile=False: the per-stage eager barriers are driver-serial
        # and would be charged to BOTH legs equally, understating the
        # ratio — the scaling legs measure one uninterrupted run.
        # TEMPEL_PROFILE=1 opts back in for per-stage serial-fraction
        # DIAGNOSIS (never for the reported ratio).
        prof = os.environ.get("TEMPEL_PROFILE", "") == "1"
        run_pipeline_bench(spark, sf / 50, scale_mult=mult, profile=False)
        out = run_pipeline_bench(spark, sf, scale_mult=mult, profile=prof)
        out["cpus"] = cpus
        print("PIPELINE_RESULT " + json.dumps(out))
        return

    if "--scaling" in sys.argv or "--scaling-weak" in sys.argv:
        # STRONG scaling (--scaling): same corpus at N and 4N pinned
        # cores; efficiency = (t_N / t_4N) / 4. Conservative — charges
        # every fixed serial cost (driver planning, per-job scheduling,
        # CC loop barriers) against the ratio, so it DEGRADES as the
        # parallel work per run shrinks (Amdahl).
        # WEAK scaling (--scaling-weak): corpus grows with the cores
        # (C at N, 4C at 4N) — the regime a 100 TB / 1000-executor
        # deployment actually lives in (data grows with the cluster);
        # efficiency = throughput_4N / (4 × throughput_N) = t_N / t_4N.
        #
        # Round-5 methodology (VERDICT r4 "Next #1"): single-draw
        # ratios are not attributable on this box (same-code same-day
        # 2v8 draws spread 0.689-0.870 in r4, wide-leg host drift
        # ±22%). The legs now INTERLEAVE within one session —
        # lo,hi,lo,hi,... for TEMPEL_SCALE_REPS (default 3) rounds —
        # so drift hits both legs alike, and efficiency is the
        # RATIO OF MEDIANS with per-leg raw times and spreads
        # reported alongside.
        weak = "--scaling-weak" in sys.argv
        lo, hi = max(1, CPUS // 4), CPUS
        # defaults sized so the WIDE leg still runs ~10 min: after the
        # round-3 CC speedup, mult=32 stopped saturating 8 cores and
        # the ratio under-read (BENCH.md strong-scaling log) — keep
        # the corpus tracking code speed. Weak mode multiplies by the
        # core ratio itself, so it starts from a smaller base to land
        # its hi leg at the same ~64 total.
        base_mult = int(os.environ.get("TEMPEL_SCALE_MULT", "16" if weak else "64"))
        reps = max(1, int(os.environ.get("TEMPEL_SCALE_REPS", "3")))
        have_taskset = subprocess.run(["which", "taskset"], capture_output=True, check=False).returncode == 0

        def one_leg(n: int) -> dict:
            mult = base_mult * (n // lo) if weak else base_mult
            env = dict(os.environ, TEMPEL_SCALE_MULT=str(mult))
            # pin the WHOLE process tree (JVM + python UDF workers) to n
            # cores — a faithful n-core executor. Bare local[n] lets the
            # python workers spill onto extra host cores, which inflates
            # the small config and understates scaling.
            prefix = ["taskset", "-c", f"0-{n-1}"] if have_taskset else []
            p = subprocess.run(
                [*prefix, sys.executable, os.path.abspath(__file__), "--pipeline-only", str(n)],
                capture_output=True, text=True, env=env, check=False,
            )
            line = [ln for ln in p.stdout.splitlines() if ln.startswith("PIPELINE_RESULT ")]
            return json.loads(line[0].split(" ", 1)[1]) if line else {"error": p.stderr[-500:]}

        legs: dict[int, list[dict]] = {lo: [], hi: []}
        for r in range(reps):
            for n in (lo, hi):  # alternate: drift hits both legs alike
                out = one_leg(n)
                legs[n].append(out)
                err = out.get("error")
                print(json.dumps({"leg": n, "rep": r, "sec_total": out.get("sec_total"), "error": err}), file=sys.stderr)
        results = {n: legs[n][-1] for n in (lo, hi)}
        eff = None
        walls = {n: [o["sec_total"] for o in legs[n] if "error" not in o] for n in (lo, hi)}
        if walls[lo] and walls[hi]:
            if weak:
                tputs = {
                    n: [o["n_mentions"] / o["sec_total"] for o in legs[n] if "error" not in o]
                    for n in (lo, hi)
                }
                eff = round(med(tputs[hi]) / (med(tputs[lo]) * (hi / lo)), 4)
            else:
                eff = round(med(walls[lo]) / (med(walls[hi]) * (hi / lo)), 4)
        payload = {
            "mode": "weak" if weak else "strong",
            "methodology": "interleaved legs, efficiency = ratio of medians",
            "reps": reps, "mult": base_mult,
            "leg_walls": {str(n): walls[n] for n in (lo, hi)},
            "leg_medians": {str(n): med(walls[n]) if walls[n] else None for n in (lo, hi)},
            "leg_spread": {str(n): [min(walls[n]), max(walls[n])] if walls[n] else None for n in (lo, hi)},
            "scaling": results, "cpus": [lo, hi], "efficiency": eff, "sf": sf,
        }
        print(json.dumps(payload))
        # persist as the round's scaling evidence; the driver-mode
        # bench attaches this file (strong under "strong", weak under
        # "weak") so BENCH_r{N}.json carries both measurements.
        ev_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING_LATEST.json")
        ev = {}
        if os.path.exists(ev_path):
            try:
                with open(ev_path) as fh:
                    ev = json.load(fh)
            except (json.JSONDecodeError, OSError):
                ev = {}
        ev[payload["mode"]] = payload
        with open(ev_path, "w") as fh:
            json.dump(ev, fh)
        return

    spark = get_spark("bench", cpus=CPUS)
    from tempel_spark.plans.testdata_queries import QUERIES

    # Median-of-K with the rep loop OUTER (rep 1 runs every query, then
    # rep 2, ...): host-level drift (VERDICT r3 adjudicated the
    # apparent r2→r3 regression as environment — same-day same-code
    # runs drifted 55→77 s) hits all queries of a rep alike, and the
    # median across temporally-spread reps discards the slow outlier
    # instead of baking it into the round's number.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    samples: dict[str, list[float]] = {n: [] for n in HEADLINE}
    samples["er_pipeline_transcripts"] = []
    pipe = None
    for _ in range(reps):
        for name in HEADLINE:
            t0 = time.time()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.time() - t0, 3))
        p = run_pipeline_bench(spark, sf)
        samples["er_pipeline_transcripts"].append(p["sec_total"])
        if pipe is not None:
            # code-sensitive invariants must be byte-stable across reps
            for k in ("n_mentions", "n_pairs_scored", "n_components"):
                assert p[k] == pipe[k], f"rep-unstable invariant {k}: {p[k]} != {pipe[k]}"
        pipe = p

    timings = {n: med(v) for n, v in samples.items()}
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_plus_er_pipeline_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "reps": reps,
        "spread": {n: [min(v), max(v)] for n, v in samples.items()},
        "pipeline": pipe,
    }
    # attach the round's recorded scaling evidence (written by
    # `bench.py --scaling` / `--scaling-weak`, interleaved-leg
    # ratio-of-medians — see SCALING_LATEST.json + BENCH.md for the
    # raw legs). The full 2v8 interleaved run takes hours, so the
    # driver-mode bench reports the round's measurement rather than
    # re-running it inline.
    ev = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING_LATEST.json")
    if os.path.exists(ev):
        with open(ev) as fh:
            out["scaling_evidence"] = json.load(fh)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
