"""Hot-cell skew probe for the streaming admission guard
(`stream_dedup_stratified_sample`).

The guard's per-batch probe join is equi-keyed on the coarse grid cell:
batch rows join the persisted admitted state on (cx, cy) and reject on
cosine >= tau.  Cell occupancy bounds that join's fan-out — so the
failure mode to measure is a HOT CELL: a corpus whose vectors
concentrate in one cell turns the probe into (batch_hot x state_hot)
pairs on a single join key, i.e. one task owning the whole batch's
work.

This probe builds two synthetic corpora of identical size — UNIFORM
(vectors spread over ~64 cells) and HOT (all vectors in one cell) —
and runs the 4-epoch admission replay in two probe-state modes:
UNCAPPED (the pre-r12 registered path: batch joins the full admitted
state) and CAPPED (the r12 registered path: batch joins the per-cell
hash-bottom-`_SADM_STATE_CAP` probe state, analytics35.py), reporting
wall time and pair volume for each.  The vectors are low-similarity
(random directions) so rejections stay rare and the measured cost is
the JOIN's, not the admission outcome's.

Interpretation for 100 TB: the uncapped hot/uniform ratio quantifies
the single-key cliff the r11 round measured (35x pairs / 5.8x wall);
the capped rows show the registered mitigation closes it — per-cell
probe pairs are bounded at batch_cell_rows x CAP at any skew.  The
rest of the mitigation ladder (documented in SCALE.md) remains
available when guard recall matters more than a bounded probe: (1) a
trained quantizer (ann_ivf_som's cells, semdedup_som_cells' top-2
assignment) equalizes occupancy where a fixed grid cannot; (2) salt
the STATE side within the hot cell (spreads tasks; pair volume
unchanged).

Usage: PYTHONPATH=/root/repo python tools/admission_skew_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 20_000  # vectors per corpus
DIM = 64
EPOCHS = 4
TAU = 0.40


def build(spark, hot: bool):
    """Deterministic synthetic corpus: id-hash-derived pseudo-random
    unit-ish vectors; cell = hash-spread (uniform) or constant (hot)."""
    from pyspark.sql import functions as F

    df = spark.range(N).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % EPOCHS).cast("int").alias("epoch"),
    )
    # 64 pseudo-random components from xxhash64(id, dim) — JVM-side,
    # deterministic, no Python in the loop
    comps = [
        (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(i)), F.lit(2001)) / 1000.0 - 1.0)
        for i in range(DIM)
    ]
    df = df.withColumn("v", F.array(*comps).cast("array<double>"))
    if hot:
        df = df.withColumn("cx", F.lit(0)).withColumn("cy", F.lit(0))
    else:
        df = df.withColumn(
            "cx", F.pmod(F.xxhash64("vec_id"), F.lit(8)).cast("int")
        ).withColumn("cy", F.pmod(F.xxhash64(F.col("vec_id") + 1), F.lit(8)).cast("int"))
    return df


def run_admission(spark, df, tag: str, capped: bool) -> None:
    import shutil

    from pyspark.sql import functions as F

    from sparkml_som_spark.functions import cosine, hash_bottom_k
    from sparkml_som_spark.operators.analytics35 import _SADM_STATE_CAP

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        f"admission_probe_{tag}",
    )
    scratch = os.path.join(base, "admitted")
    probe_dir = os.path.join(base, "probe")
    shutil.rmtree(base, ignore_errors=True)
    t0 = time.time()
    pairs = 0
    for e in range(EPOCHS):
        batch = df.where(F.col("epoch") == e).drop("epoch")
        state_dir = probe_dir if capped else scratch
        if os.path.isdir(state_dir):
            state = spark.read.parquet(state_dir)
            joined = batch.alias("x").join(
                state.alias("s"),
                (F.col("x.cx") == F.col("s.cx")) & (F.col("x.cy") == F.col("s.cy")),
            )
            pairs += joined.count()
            rejected = (
                joined.where(cosine(F.col("s.v"), F.col("x.v")) >= TAU)
                .select(F.col("x.vec_id").alias("vec_id"))
                .distinct()
            )
            admitted = batch.join(rejected, "vec_id", "left_anti")
        else:
            admitted = batch
        if capped:
            admitted = admitted.localCheckpoint(eager=True)
        admitted.write.mode("append").parquet(scratch)
        if capped:
            ppool = admitted.select("vec_id", "v", "cx", "cy")
            if os.path.isdir(probe_dir):
                ppool = ppool.unionByName(spark.read.parquet(probe_dir))
            new_probe = hash_bottom_k(
                ppool, ("cx", "cy"), _SADM_STATE_CAP
            ).localCheckpoint(eager=True)
            new_probe.write.mode("overwrite").parquet(probe_dir)
    wall = time.time() - t0
    n_adm = spark.read.parquet(scratch).count()
    mode = "capped" if capped else "uncapped"
    print(
        f"{tag:8s} {mode:8s} wall {wall:6.2f} s   probe pairs {pairs:>12,}"
        f"   admitted {n_adm:,}",
        flush=True,
    )
    shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    from sparkml_som_spark.session import get_spark

    spark = get_spark("admission-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for tag, hot in (("uniform", False), ("hot", True)):
        df = build(spark, hot).persist()
        df.count()
        for capped in (False, True):
            run_admission(spark, df, tag, capped)
        df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
