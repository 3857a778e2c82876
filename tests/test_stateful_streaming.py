"""applyInPandasWithState: first-seen surface dedup across
micro-batch runs — state must persist between reruns."""

from __future__ import annotations

import tempfile


def test_first_seen_surfaces_state_across_runs(spark):
    from tempel_spark.streaming.stateful import stream_first_seen_surfaces
    from tempel_spark.synth import synth_transcripts

    snaps = [f"{y}-01-01 00:00:00" for y in (2013, 2014, 2015, 2016)]
    t1 = synth_transcripts(spark, n_convs=15, n_entities=6, seed=1)
    t2 = synth_transcripts(spark, n_convs=15, n_entities=6, seed=1)  # same corpus → all dupes
    t3 = synth_transcripts(spark, n_convs=15, n_entities=6, seed=99)  # some new surfaces

    with tempfile.TemporaryDirectory(prefix="state_") as tmp:
        inp, outp, ck = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ck"
        t1.write.parquet(f"{inp}/b1")
        stream_first_seen_surfaces(spark, f"{inp}/*", outp, ck, snaps)
        n1 = spark.read.parquet(outp).count()
        assert n1 > 0

        # identical corpus again → ZERO new first-seen rows
        t2.write.parquet(f"{inp}/b2")
        stream_first_seen_surfaces(spark, f"{inp}/*", outp, ck, snaps)
        n2 = spark.read.parquet(outp).count()
        assert n2 == n1, "state failed to suppress already-seen surfaces"

        # new seed → some genuinely new surfaces, and only those appear
        t3.write.parquet(f"{inp}/b3")
        stream_first_seen_surfaces(spark, f"{inp}/*", outp, ck, snaps)
        out = spark.read.parquet(outp)
        n3 = out.count()
        assert n3 > n2
        # vocabulary property: (snapshot, surface) unique across all runs
        assert out.select("snapshot_ts", "surface").distinct().count() == n3
