#!/usr/bin/env python
"""Interleaved A/B bench of two git refs (VERDICT r3 Next #4).

Host drift on this box swings same-code bench walls ±40% within a day
(BENCH.md "same-day drift" log), so round-over-round comparisons of
raw BENCH_r{N}.json files conflate code with environment.  This
harness removes the environment term by ALTERNATING runs of the two
code versions (A B A B ...), so any drift window covers both sides
equally, then reports per-query medians and the A/B ratio.

Usage:
    python scripts/ab_bench.py <ref_A> <ref_B> [reps]

Each ref is checked out into a throwaway git worktree; each rep runs
that checkout's own bench.py (SPARK_GRAFT_REPS=1 — the interleaving
lives HERE, not inside the child) against the same $SPARK_GRAFT_SF_DIR.
Prints one JSON line: per-query medians for both sides, B/A ratios,
and the count invariants from each side's last rep (a ratio is only
attributable to code when the invariants match).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile


def _run(cmd: list[str], **kw) -> subprocess.CompletedProcess:
    return subprocess.run(cmd, capture_output=True, text=True, check=False, **kw)


def bench_once(tree: str) -> dict | None:
    env = dict(os.environ, SPARK_GRAFT_REPS="1")
    p = _run([sys.executable, "bench.py"], cwd=tree, env=env)
    for ln in reversed(p.stdout.splitlines()):
        if ln.startswith("{"):
            try:
                return json.loads(ln)
            except json.JSONDecodeError:
                continue
    sys.stderr.write(f"bench failed in {tree}:\n{p.stderr[-2000:]}\n")
    return None


def med(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return round(s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2, 3)


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    ref_a, ref_b = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    trees, invariants, samples = {}, {}, {"A": {}, "B": {}}
    tmp = tempfile.mkdtemp(prefix="ab_bench_")
    try:
        for side, ref in (("A", ref_a), ("B", ref_b)):
            tree = os.path.join(tmp, side)
            p = _run(["git", "worktree", "add", "--detach", tree, ref], cwd=repo)
            if p.returncode != 0:
                sys.exit(f"worktree add {ref} failed: {p.stderr}")
            trees[side] = tree

        for rep in range(reps):
            for side in ("A", "B"):
                out = bench_once(trees[side])
                if out is None:
                    continue
                for q, sec in out.get("queries", {}).items():
                    samples[side].setdefault(q, []).append(sec)
                pipe = out.get("pipeline", {})
                invariants[side] = {
                    k: pipe.get(k) for k in ("n_mentions", "n_pairs_scored", "n_components")
                }
                sys.stderr.write(f"rep {rep + 1}/{reps} side {side}: "
                                 f"total {out.get('value')}s\n")
    finally:
        for tree in trees.values():
            _run(["git", "worktree", "remove", "--force", tree], cwd=repo)

    meds = {s: {q: med(v) for q, v in samples[s].items()} for s in ("A", "B")}
    common = sorted(set(meds["A"]) & set(meds["B"]))
    ratio = {q: round(meds["B"][q] / meds["A"][q], 3) for q in common if meds["A"][q] > 0}
    print(json.dumps({
        "ref_a": ref_a, "ref_b": ref_b, "reps": reps,
        "median_a": meds["A"], "median_b": meds["B"],
        "ratio_b_over_a": ratio,
        "total_a": round(sum(meds["A"].values()), 3),
        "total_b": round(sum(meds["B"].values()), 3),
        "invariants": invariants,
        "invariants_match": invariants.get("A") == invariants.get("B"),
    }))


if __name__ == "__main__":
    main()
