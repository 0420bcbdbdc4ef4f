"""Measure the Spark-JVM host scaling ceiling on this VM (no Python workers).

The north rule asks for >= 0.8 throughput scaling efficiency between N and
4N executors. This job establishes what the HOST can deliver for a purely
JVM-side, CPU-bound Spark stage (whole-stage codegen string/regex/hash work
over the same synthetic corpus the KG job uses — no Python workers, no
shuffle, no UDFs): any efficiency the hardware/hypervisor loses here is a
cap on every Spark job on this box, and the pipeline's own efficiency
should be read relative to it.

Usage: python scripts/jvm_ceiling.py [n_docs] [cores ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
CORES = [int(c) for c in sys.argv[2:]] or [8, 32]


def jvm_heavy(df):
    """CPU-heavy, JVM-only, shuffle-free: regex token scan + repeated hashing
    over note_text — roughly the per-doc work profile of the extraction UDF,
    expressed in whole-stage-codegen built-ins."""
    from pyspark.sql import functions as F

    out = df.select(
        "doc_id",
        F.size(F.regexp_extract_all("note_text", F.lit(r"[A-Za-z]+"), 0)).alias("n_words"),
        F.sha2(F.col("note_text"), 256).alias("h0"),
    )
    for i in range(1, 24):  # chain of dependent hashes: pure CPU, no memory blowup
        out = out.withColumn("h0", F.sha2(F.concat("h0", F.lit(str(i))), 256))
    return out.select("doc_id", "n_words", "h0")


def main():
    from llacie_spark.corpus import assemble_text, synthetic_documents
    from llacie_spark.session import get_spark

    results = {}
    for cpus in CORES:
        spark = get_spark(
            app_name=f"jvm-ceiling-{cpus}",
            master=f"local[{cpus}]",
            shuffle_partitions=max(cpus, 8),
        )
        docs = assemble_text(
            synthetic_documents(
                spark, N_DOCS, partitions=8 * spark.sparkContext.defaultParallelism
            )
        )
        job = jvm_heavy(docs)
        job.write.format("noop").mode("overwrite").save()  # JIT warm-up
        timed = []
        for _ in range(2):
            t0 = time.time()
            job.write.format("noop").mode("overwrite").save()
            timed.append(round(time.time() - t0, 2))
        spark.stop()
        best = min(timed)
        results[cpus] = best
        print(f"[{cpus:>2} cores] {best:.2f}s  ({N_DOCS / best:.0f} docs/sec)  runs={timed}", flush=True)

    if len(CORES) == 2:
        lo, hi = CORES
        eff = (results[lo] / results[hi]) / (hi / lo)
        print(f"\nJVM-only ceiling {lo}->{hi} cores: efficiency = {eff:.3f}")


if __name__ == "__main__":
    main()
