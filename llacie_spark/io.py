"""Table IO with snapshot commits: the resumable-pipeline seam.

Production target is an Iceberg catalog (atomic snapshot commits, MERGE INTO,
time travel); this sandbox has no Iceberg runtime jar, so the same contract
is implemented over parquet directories with a JSON snapshot manifest:

- :func:`write_stage` — write a stage output then atomically publish a
  manifest (write-temp + rename). A directory without a valid manifest is an
  uncommitted partial write and is invisible to readers — the moral
  equivalent of an Iceberg snapshot, and of the reference's ``*.done.db``
  rename commit marker (``/root/reference/llacie/cache/sqlite.py:303-314``).
- :func:`read_stage` — read the latest committed snapshot (None if absent).
- :func:`unfinished` — anti-join work discovery: input rows with no
  committed output row, the reference's incremental resume
  (``llacie/db.py:421-511``, J1-J3).
- :func:`upsert` — delete-then-insert by key: replace output rows for keys
  present in the new batch, keep the rest (the reference's
  ``ON CONFLICT DO UPDATE`` / ``replace_episode_labels`` semantics,
  ``llacie/db.py:650-665,769-803``). With Iceberg this is ``MERGE INTO``.
  Here the table is laid out in key-hash buckets and the manifest maps each
  bucket to the snapshot directory that last wrote it, so an upsert rewrites
  ONLY the buckets its keys hash into — cost scales with batch size, not
  table size (the reference's upsert likewise touches only conflicting rows;
  Iceberg MERGE INTO rewrites only affected files). Untouched bucket files
  are carried forward by reference, byte-identical.

Layout per table::

    <root>/<name>/snap-<k>/_bucket=<b>/part-*.parquet  # bucket b, written at k
    <root>/<name>/_SNAPSHOT.json  # {"snapshot": k, "buckets": {"b": "snap-j"}}

(Unbucketed tables — written without a key — keep the flat
``snap-<k>/part-*.parquet`` layout; the first upsert converts them.)
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotCatalog:
    def __init__(self, root: str):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------- manifest

    def _manifest_path(self, name: str) -> Path:
        return self.root / name / "_SNAPSHOT.json"

    def current_snapshot(self, name: str) -> dict | None:
        p = self._manifest_path(name)
        if not p.exists():
            return None
        try:
            return json.loads(p.read_text())
        except (json.JSONDecodeError, OSError):
            return None  # torn manifest = uncommitted

    def _publish(self, name: str, snap_id: int, meta: dict) -> None:
        manifest = {"snapshot": snap_id, "committed_at": time.time(), **meta}
        p = self._manifest_path(name)
        tmp = p.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(manifest))
        os.replace(tmp, p)  # atomic on POSIX: the commit point

    # ------------------------------------------------------------ bucketing

    @staticmethod
    def _bucket_expr(keys: list[str], n_buckets: int):
        """Deterministic key-hash bucket id. xxhash64 (JVM, codegen'd) over
        the key columns; same expression every write so a key always lands
        in the same bucket across snapshots."""
        return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))

    def _write_buckets(self, df: DataFrame, name: str, snap_id: int, keys: list[str], n_buckets: int) -> list[int]:
        """Write ``df`` under ``snap-<id>/_bucket=<b>/``; return bucket ids
        written. One output file per bucket per snapshot (the repartition is
        on the bucket id, so a 1000-executor write still produces
        ``n_buckets`` files, not executors × buckets)."""
        path = self.root / name / f"snap-{snap_id}"
        out = df.withColumn("_bucket", self._bucket_expr(keys, n_buckets))
        (
            out.repartition(n_buckets, "_bucket")
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(str(path))
        )
        return sorted(
            int(p.name.split("=", 1)[1])
            for p in path.iterdir()
            if p.is_dir() and p.name.startswith("_bucket=")
        )

    def _bucket_paths(self, name: str, cur: dict) -> list[str]:
        return [
            str(self.root / name / snap / f"_bucket={b}")
            for b, snap in sorted(cur["buckets"].items(), key=lambda kv: int(kv[0]))
        ]

    # ----------------------------------------------------------------- api

    def write_stage(
        self,
        df: DataFrame,
        name: str,
        meta: dict | None = None,
        bucket_key: str | list[str] | None = None,
        n_buckets: int = 32,
    ) -> dict:
        """Materialize ``df`` as the next snapshot of ``name`` and commit.

        Snapshots are always full replacements (append semantics go through
        :meth:`upsert`); a crash before ``_publish`` leaves the previous
        snapshot as the readable state — rerunning the stage is safe.

        With ``bucket_key`` the data is laid out in key-hash buckets so later
        :meth:`upsert` calls rewrite only touched buckets."""
        cur = self.current_snapshot(name)
        snap_id = (cur["snapshot"] + 1) if cur else 0
        path = self.root / name / f"snap-{snap_id}"
        extra = dict(meta or {})
        if bucket_key is not None:
            keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
            written = self._write_buckets(df, name, snap_id, keys, n_buckets)
            extra.update(
                bucket_key=keys,
                n_buckets=n_buckets,
                columns=df.columns,  # the table schema every upsert must match
                buckets={str(b): f"snap-{snap_id}" for b in written},
            )
        else:
            df.write.mode("overwrite").parquet(str(path))
        self._publish(name, snap_id, extra)
        return self.current_snapshot(name)

    def read_stage(self, spark: SparkSession, name: str) -> DataFrame | None:
        cur = self.current_snapshot(name)
        if cur is None:
            return None
        if cur.get("buckets"):
            paths = self._bucket_paths(name, cur)
            return spark.read.parquet(*paths)
        if cur.get("buckets") == {}:  # bucketed but empty table
            return None
        return spark.read.parquet(str(self.root / name / f"snap-{cur['snapshot']}"))

    def unfinished(
        self,
        spark: SparkSession,
        input_df: DataFrame,
        name: str,
        key: str | list[str],
        redo_older_than=None,
        updated_col: str = "updated_at",
    ) -> DataFrame:
        """Input rows not yet present in the committed output (J1-J3).

        ``redo_older_than`` (datetime or ISO string) marks committed rows
        whose ``updated_col`` predates the cutoff as stale: they no longer
        count as done, so the stale subset is re-extracted — the reference's
        ``--redo-older-than`` staleness reprocessing after a strategy
        upgrade (``llacie/scripts/llacie.py:114-116``; ``llacie/db.py:
        445-449`` adds ``last_updated >= newer_than`` to the done-set
        query, which is the same predicate)."""
        keys = [key] if isinstance(key, str) else list(key)
        done = self.read_stage(spark, name)
        if done is None:
            return input_df
        if redo_older_than is not None:
            # validate driver-side: an unparseable cutoff would cast to NULL
            # in the comparison, filter out EVERY done row, and silently
            # re-extract the whole corpus (ADVICE r2)
            if isinstance(redo_older_than, str):
                from datetime import datetime

                try:
                    redo_older_than = datetime.fromisoformat(redo_older_than)
                except ValueError as e:
                    raise ValueError(
                        f"redo_older_than is not an ISO timestamp: {redo_older_than!r}"
                    ) from e
            done = done.where(F.col(updated_col) >= F.lit(redo_older_than))
        return input_df.join(done.select(*keys).distinct(), keys, "left_anti")

    def upsert(
        self,
        spark: SparkSession,
        df: DataFrame,
        name: str,
        key: str | list[str],
        n_buckets: int = 32,
    ) -> dict:
        """Replace committed rows whose key appears in ``df``; keep others —
        Iceberg ``MERGE INTO ... WHEN MATCHED THEN UPDATE`` semantics.

        Incremental: the table lives in key-hash buckets (see module doc);
        only buckets that ``df``'s keys hash into are re-read, anti-joined,
        and rewritten into the new snapshot directory. Every other bucket is
        carried forward in the manifest by reference — its files are not
        reread, rewritten, or even opened, so upsert IO is O(batch + touched
        buckets), not O(table). A table first written without buckets is
        converted to the bucketed layout on its first upsert (one full
        rewrite, then incremental forever)."""
        keys = [key] if isinstance(key, str) else list(key)
        cur = self.current_snapshot(name)
        if cur is None:
            return self.write_stage(df, name, bucket_key=keys, n_buckets=n_buckets)
        if not cur.get("bucket_key"):
            # legacy flat table: one-time conversion to the bucketed layout
            existing = self.read_stage(spark, name)
            kept = existing.join(df.select(*keys).distinct(), keys, "left_anti")
            merged = kept.unionByName(df, allowMissingColumns=False)
            return self.write_stage(merged, name, bucket_key=keys, n_buckets=n_buckets)
        if cur["bucket_key"] != keys:
            raise ValueError(
                f"table {name!r} is bucketed by {cur['bucket_key']}, upsert key {keys}"
            )
        n_buckets = cur["n_buckets"]
        # schema contract: the batch must carry exactly the table's columns.
        # Without this check a new batch column would be silently dropped
        # when merging with old buckets but WRITTEN when its keys hit only
        # fresh buckets — mixed schemas across bucket files that a plain
        # multi-path read resolves arbitrarily.
        expected = cur.get("columns") or spark.read.parquet(
            self._bucket_paths(name, cur)[0]
        ).columns
        if set(df.columns) != set(expected):
            raise ValueError(
                f"upsert batch columns {sorted(df.columns)} != table columns "
                f"{sorted(expected)} for {name!r}"
            )
        df = df.select(*expected)
        # one evaluation of the batch feeds the touched-bucket collect AND
        # the bucket write: without the persist, a nondeterministic lineage
        # could hash keys into a bucket during the write that the touched
        # set missed — moving that bucket's manifest pointer without
        # carrying its old rows forward (silent row loss)
        df = df.persist()
        try:
            # touched buckets: at most n_buckets distinct ids — a driver-side
            # collect of a bounded, tiny aggregate (never row data)
            touched = sorted(
                r[0]
                for r in df.select(self._bucket_expr(keys, n_buckets).alias("b"))
                .distinct()
                .collect()
            )
            old_paths = [
                str(self.root / name / cur["buckets"][str(b)] / f"_bucket={b}")
                for b in touched
                if str(b) in cur["buckets"]
            ]
            if old_paths:
                old_touched = spark.read.parquet(*old_paths)
                kept = old_touched.join(df.select(*keys).distinct(), keys, "left_anti")
                merged = kept.select(*expected).unionByName(df)
            else:
                merged = df
            snap_id = cur["snapshot"] + 1
            written = self._write_buckets(merged, name, snap_id, keys, n_buckets)
        finally:
            df.unpersist()
        unexpected = [b for b in written if b not in touched]
        if unexpected:
            raise RuntimeError(
                f"upsert wrote buckets {unexpected} outside the touched set "
                f"{touched} — nondeterministic batch keys; table {name!r} "
                "manifest NOT updated (previous snapshot remains committed)"
            )
        buckets = dict(cur["buckets"])
        for b in written:
            buckets[str(b)] = f"snap-{snap_id}"
        self._publish(
            name,
            snap_id,
            {
                "bucket_key": keys,
                "n_buckets": n_buckets,
                "columns": expected,
                "buckets": buckets,
            },
        )
        return self.current_snapshot(name)

    def vacuum(self, name: str) -> list[str]:
        """Delete snapshot directories no longer referenced by the current
        manifest (Iceberg ``expire_snapshots``). Safe after any commit;
        returns the removed directory names."""
        import shutil

        cur = self.current_snapshot(name)
        if cur is None:
            return []
        live = {f"snap-{cur['snapshot']}"} | set(cur.get("buckets", {}).values())
        removed = []
        for p in (self.root / name).iterdir():
            if p.is_dir() and p.name.startswith("snap-") and p.name not in live:
                shutil.rmtree(p)
                removed.append(p.name)
        return sorted(removed)

    def drop(self, name: str) -> None:
        import shutil

        if (self.root / name).exists():
            shutil.rmtree(self.root / name)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key.

    Bucketing is the 100 TB join strategy: two tables bucketed on the same
    key with the same bucket count join with NO exchange — each task reads
    matching buckets from both sides. For the KG tables that means
    documents/mentions/triples all bucketed by doc_id (or subj) join and
    re-aggregate shuffle-free across stages. Requires ``saveAsTable`` (the
    bucketing metadata lives in the session catalog / metastore)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def with_runtime_metrics(df: DataFrame, started_at: float) -> DataFrame:
    """Attach the per-row share of stage wall-clock (the reference's
    ``strategy_runtime`` accounting, abstract_vllm_or_lcp.py:204-205) —
    cheap approximation: stage elapsed so far at write time."""
    return df.withColumn("batch_runtime_s", F.lit(time.time() - started_at))
