"""Decompose the KG scaling job: where does 8->32 lose efficiency?

Runs each sub-stage in isolation at two core counts (default 8 and 32),
with warmups, and samples /proc/stat during each timed run to split wall
time into user/sys/idle. Output: one table per stage.

Usage: python scripts/profile_scaling.py [n_docs] [cores ...]
"""

from __future__ import annotations

import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
CORES = [int(c) for c in sys.argv[2:]] or [8, 32]


def read_cpu():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    user, nice, system, idle, iowait = (int(x) for x in parts[1:6])
    return user + nice, system, idle + iowait


class CpuSampler:
    def __enter__(self):
        self.t0 = read_cpu()
        return self

    def __exit__(self, *a):
        t1 = read_cpu()
        self.user = t1[0] - self.t0[0]
        self.sys = t1[1] - self.t0[1]
        self.idle = t1[2] - self.t0[2]
        total = self.user + self.sys + self.idle
        self.pct = tuple(round(100 * x / total, 1) for x in (self.user, self.sys, self.idle))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def build(spark, n_docs):
    from llacie_spark.corpus import assemble_text, synthetic_doc_meta, synthetic_documents
    from llacie_spark.pipeline import episode_triples, fused_extract
    from llacie_spark.vocab import Vocab

    vocab = Vocab.from_csv(str(REPO / "fixtures/vocab_pres_sx_v2.csv"))
    parts = 8 * spark.sparkContext.defaultParallelism
    docs = synthetic_documents(spark, n_docs, partitions=parts)
    meta = synthetic_doc_meta(spark, n_docs)
    with_text = assemble_text(docs)
    linked = fused_extract(with_text, vocab)
    triples = episode_triples(linked, meta)
    return with_text, linked, triples


def main():
    from llacie_spark.session import get_spark, prewarm_python_workers

    stages = {}
    for cpus in CORES:
        spark = get_spark(
            app_name=f"profile-{cpus}", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
        )
        prewarm_python_workers(spark)
        with_text, linked, triples = build(spark, N_DOCS)

        runs = [
            ("gen+assemble", lambda: noop(with_text)),
            ("..+fused_udf", lambda: noop(linked.select("doc_id", "matches"))),
            ("..+full_noop", lambda: noop(triples)),
            ("full_count  ", lambda: triples.count()),
        ]
        for name, fn in runs:
            fn()  # warm
            best = None
            for _ in range(2):
                with CpuSampler() as cs:
                    t0 = time.time()
                    fn()
                    dt = time.time() - t0
                if best is None or dt < best[0]:
                    best = (dt, cs.pct)
            stages.setdefault(name, {})[cpus] = best
            print(f"[{cpus:>2} cores] {name}  {best[0]:7.2f}s  user/sys/idle% = {best[1]}", flush=True)
        spark.stop()

    print("\n=== efficiency (T_N / T_4N) / (4N/N) ===")
    if len(CORES) == 2:
        lo, hi = CORES
        for name, r in stages.items():
            eff = (r[lo][0] / r[hi][0]) / (hi / lo)
            print(f"{name}  {lo}c={r[lo][0]:.2f}s {hi}c={r[hi][0]:.2f}s  eff={eff:.3f}")


if __name__ == "__main__":
    main()
