"""Spark-level wiring: salted extraction, lineage, checkpoint-resume.

Scale design (the 10^12-doc / 1000-executor story, tested at local[32]):

- **One shuffle, total.** The only exchange in the whole job is the salted
  ``repartition(P, xxhash64(doc_id))`` that defuses skew from giant
  multi-page documents (BASELINE.json north_star). Extraction itself is a
  narrow ``mapInArrow``/``mapInPandas``; the lineage aggregate is a
  partial-agg over the already-partitioned output, so AQE coalesces it
  cheaply. (Monster documents optionally fan out per page-group first —
  pagesplit.py.)
- **Deterministic partitioning.** ``part_id`` is a *column*
  (``pmod(xxhash64(doc_id), P)``), not the runtime partition index, so
  lineage/resume is stable across schedulers, cluster sizes, and retries.
- **Idempotent writes.** Output is written partitioned by ``part_id`` with
  dynamic partition overwrite: re-running a failed partition replaces exactly
  its own files (Iceberg overwrite-by-partition in production; parquet
  dynamic overwrite in this sandbox).
- **Resume = anti-join.** Pending work is
  ``docs.join(completed_lineage, "part_id", "left_anti")`` — a broadcast
  anti-join (lineage has P rows), no extra shuffle of the fact side beyond
  the salting exchange it needs anyway.
- **Bounded Arrow batches.** Set
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (docs vary wildly in
  size); the kernel is O(tokens) per batch with numpy-vectorized glyph work.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import DEFAULT_CONFIG, ExtractConfig, make_extract_batch
from .schema import SPAN_FLAT_SCHEMA, SPAN_SCHEMA


def with_part_id(docs: DataFrame, num_partitions: int) -> DataFrame:
    """Deterministic salt: pmod(xxhash64(doc_id), P) (SURVEY.md §4)."""
    return docs.withColumn(
        "part_id", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(num_partitions)).cast("int")
    )


def extract_spans(docs: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG,
                  num_partitions: int | None = None,
                  nested: bool = True,
                  presalted: bool = False) -> DataFrame:
    """documents -> ordered spans. The salted repartition is the only
    shuffle; extraction is narrow from there on.

    ``presalted=True``: the input is already hash-balanced on doc_id (e.g.
    the corpus builder repartitioned before synthesis) — extraction is
    per-document independent, so no second shuffle is needed; ``part_id``
    stays the deterministic column either way. This shuffles the small
    (doc_id, payload) rows once instead of re-shuffling them post-synthesis.
    """
    spark = docs.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    salted = with_part_id(docs, p)
    if not presalted:
        # Shuffle on the raw 64-bit hash, not the p-valued part_id: hashing
        # only p distinct values into p partitions leaves ~37% of tasks empty
        # and piles 2-3 part_ids onto others (Poisson occupancy). The raw
        # hash balances by law of large numbers; part_id stays a
        # deterministic *column* for lineage/resume either way.
        salted = salted.repartition(p, F.xxhash64(F.col("doc_id")))
    if nested:
        return salted.mapInPandas(make_extract_batch(cfg, nested=True),
                                  SPAN_SCHEMA)
    # flat path goes through mapInArrow: pyarrow batches in/out skip pandas
    # block consolidation on the (large) output side
    from .extract import make_extract_arrow
    return salted.mapInArrow(make_extract_arrow(cfg), SPAN_FLAT_SCHEMA)


def lineage(spans: DataFrame) -> DataFrame:
    """Per-partition lineage + metrics rows (north rule): partition id, doc
    count, span count, per-kind breakdown, max document size, and an
    order-insensitive checksum. bit_xor keeps the checksum overflow-free
    and commutative, so it is insensitive to within-partition ordering.
    All metrics are map-side-combinable aggregates over the already-written
    partition — no extra shuffle."""
    def kind_count(k: str):
        return F.sum((F.col("kind") == k).cast("long")).alias(f"n_{k}")

    return spans.groupBy("part_id").agg(
        F.countDistinct("doc_id").alias("doc_count"),
        F.count(F.lit(1)).alias("span_count"),
        kind_count("text"), kind_count("page"), kind_count("rect"),
        kind_count("line"), kind_count("image"), kind_count("font"),
        kind_count("meta"),
        (F.max("order") + 1).alias("max_doc_spans"),
        F.bit_xor(
            F.xxhash64("doc_id", "order", "kind", "text", "media_ref")
        ).alias("checksum"),
    )


class FailureInjection(Exception):
    pass


def _recover_lineage_swap(lineage_dir: str) -> None:
    """Self-heal a crash mid-way through upsert_docs' parquet lineage swap
    (write _new -> rename live aside to _old -> rename _new in -> rm _old).
    Every crash window leaves a complete copy under exactly one of the
    three names; prefer _new (it is fully written before any rename)."""
    import os
    import shutil

    if os.path.isdir(lineage_dir):
        # normal case — at worst a stale _old survived the final rmtree
        # crash window; it is superseded, drop it
        shutil.rmtree(lineage_dir + "_old", ignore_errors=True)
        return
    old, new = lineage_dir + "_old", lineage_dir + "_new"
    if os.path.isdir(old) and os.path.isdir(new):
        # crashed between the two renames: _new is the complete result
        os.rename(new, lineage_dir)
        shutil.rmtree(old)
    elif os.path.isdir(old):
        os.rename(old, lineage_dir)


def run_checkpointed(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    num_partitions: int = 32,
    run_id: str | None = None,
    fail_parts: set[int] | None = None,
    split_min_bytes: int | None = None,
    pages_per_group: int = 8,
) -> dict:
    """One checkpointed run: extract only partitions that have no lineage row
    yet, write them idempotently, append lineage. Returns run stats.

    ``fail_parts`` injects a failure for those part_ids (the partition's
    lineage row is withheld and its output discarded) to test resume.

    ``split_min_bytes`` (opt-in) routes extraction through the page-split
    path (pagesplit.extract_spans_paged): documents whose content streams
    exceed the threshold fan out per ``pages_per_group`` pages so one
    monster document cannot become one task's working set. The split path
    is bit-equal on the supported corpus classes (tests/test_pagesplit.py)
    and pays one extra per-document window renumber.
    """
    from . import tables

    run_id = run_id or uuid.uuid4().hex[:12]
    if tables.is_table_identifier(out_dir):
        # Iceberg catalog namespace: <out>_spans / <out>_lineage tables
        spans_dir = f"{out_dir}_spans"
        lineage_dir = f"{out_dir}_lineage"
    else:
        spans_dir = f"{out_dir}/spans"
        lineage_dir = f"{out_dir}/lineage"

    if not tables.is_table_identifier(out_dir):
        _recover_lineage_swap(lineage_dir)
    try:
        prior = tables.read_table(spark, lineage_dir)
    except Exception:  # no lineage yet -> everything pending
        prior = None

    if prior is not None and "num_partitions" in prior.columns:
        # part_id = pmod(xxhash64(doc_id), P): resuming with a different P
        # would remap every part_id, defeat the anti-join, and double-write
        # already-extracted documents — so the salt modulus is pinned by the
        # first run's lineage and silently reused on resume.
        stored = prior.select(F.max("num_partitions")).first()[0]
        if stored is not None and int(stored) != num_partitions:
            import warnings
            warnings.warn(
                f"resume: ignoring num_partitions={num_partitions}; the "
                f"salt modulus is pinned to {int(stored)} by this "
                "output's lineage", stacklevel=2)
            num_partitions = int(stored)

    salted = with_part_id(docs, num_partitions)
    if prior is not None:
        done = prior.select("part_id").distinct()
        pending = salted.join(F.broadcast(done), "part_id", "left_anti")
    else:
        pending = salted

    # partition ids this run is responsible for (BEFORE extraction, so a
    # partition whose docs all extract to zero spans STILL gets a lineage
    # row — otherwise resume would re-extract it forever)
    processed = [int(r.part_id) for r in
                 pending.select("part_id").distinct().collect()]
    if fail_parts:
        processed = [p for p in processed if p not in fail_parts]

    if split_min_bytes is not None:
        # monster-doc defense: page-group fan-out (does its own salting +
        # renumber; part_id is the same pmod(xxhash64) column either way)
        from .pagesplit import extract_spans_paged
        spans = extract_spans_paged(
            pending.drop("part_id"), cfg, num_partitions,
            pages_per_group=pages_per_group, min_bytes=split_min_bytes)
    else:
        # shuffle on the raw 64-bit hash (pmod into num_partitions values
        # leaves ~1/e of the extraction tasks empty — same Poisson-occupancy
        # fix as extract_spans above); part_id stays the deterministic COLUMN
        pending = pending.repartition(num_partitions, F.xxhash64("doc_id"))
        from .extract import make_extract_arrow
        spans = pending.mapInArrow(make_extract_arrow(cfg),
                                   SPAN_FLAT_SCHEMA)
    if fail_parts:
        # simulate a mid-job crash: these partitions produce no output and
        # no lineage row this run
        spans = spans.filter(~F.col("part_id").isin(*fail_parts))

    tables.write_partitioned(spans, spans_dir, "part_id", spark)

    # Read back ONLY this run's partitions: the literal isin() predicate on
    # the partition column statically prunes the scan (the table is
    # partitioned by part_id), so lineage costs O(this run's output) — never
    # O(cumulative table). The previous broadcast-join shape *might* DPP-prune
    # but nothing guaranteed it; at 10^12 docs every resume paid a full-table
    # scan (VERDICT r2 #3).
    written = tables.read_table(spark, spans_dir)
    this_run = (written.where(F.col("part_id").isin(processed))
                if processed else written.where(F.lit(False)))
    proc_df = spark.createDataFrame(
        [(p,) for p in processed] or [(None,)], "part_id int").where(
        F.col("part_id").isNotNull())
    # lineage for every PROCESSED partition; zero-span partitions get an
    # explicit zero row (checksum 0) so they count as done
    stats = lineage(this_run)
    new_lineage = (
        proc_df.join(stats, "part_id", "left")
        .fillna(0, subset=[c for c in stats.columns if c != "part_id"])
        .withColumn("run_id", F.lit(run_id))
        .withColumn("completed_at", F.current_timestamp())
        .withColumn("num_partitions", F.lit(num_partitions))
    )
    tables.append_table(new_lineage, lineage_dir, spark)

    done_now = tables.read_table(spark, lineage_dir)
    run_spans = sum(
        r.span_count for r in new_lineage.select("span_count").collect())
    # Cumulative size comes from the P-row lineage table (each part_id has
    # exactly one lineage row once done; failed partitions have none and no
    # data), NOT from a count() scan of the cumulative spans table.
    agg = done_now.agg(
        F.countDistinct("part_id").alias("parts"),
        F.sum("span_count").alias("total")).collect()[0]
    return {
        "run_id": run_id,
        "parts_done": int(agg["parts"]),
        "span_count": int(run_spans),                 # THIS run's spans
        "total_span_count": int(agg["total"] or 0),   # from lineage, O(P)
    }


def compact_spans(spark: SparkSession, spans_dir: str,
                  files_per_partition: int = 1) -> dict:
    """Small-file compaction of the spans table (the maintenance job every
    long-lived ingest needs: each extraction task writes a file into every
    part_id dir it holds rows for, so a P-partition table accretes
    tasks x P files over many runs).

    Rewrites each ``part_id`` partition into exactly ``files_per_partition``
    files via one shuffle keyed on (part_id[, intra-partition salt]) +
    dynamic partition overwrite — content is bit-identical (same rows, same
    columns), so lineage checksums stay valid; only file layout changes.
    The input is eagerly materialized before the overwrite because source
    and target are the same location (lazy re-read during its own overwrite
    would race the delete). On Iceberg this maps to the
    rewrite_data_files maintenance procedure; the parquet path implements
    the same contract for the sandbox.
    """
    from . import tables

    spans = tables.read_table(spark, spans_dir)
    n_before = spans.rdd.getNumPartitions()
    spans = spans.localCheckpoint(eager=True)
    if files_per_partition <= 1:
        compacted = spans.repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
            F.col("part_id"))
    else:
        compacted = spans.repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
            * files_per_partition,
            F.col("part_id"),
            F.pmod(F.xxhash64("doc_id"), F.lit(files_per_partition)))
    tables.write_partitioned(compacted, spans_dir, "part_id", spark)
    return {"input_tasks": int(n_before)}


def upsert_docs(
    spark: SparkSession,
    updated_docs: DataFrame,
    out_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    run_id: str | None = None,
) -> dict:
    """Incremental re-extraction (the MERGE INTO of the spans table): given
    changed/new document versions, re-extract ONLY them and replace their
    spans in place.

    Dynamic partition overwrite replaces whole ``part_id`` partitions, and a
    partition holds unrelated documents too — so each affected partition is
    rebuilt as (existing spans minus updated doc_ids) UNION (fresh spans),
    then overwritten. Cost is O(affected partitions), never O(table): the
    read-back prunes on a literal part_id isin() (static partition
    pruning), and unaffected partitions' files are untouched. Lineage rows
    for the affected partitions are recomputed so checksums stay true.
    On Iceberg the same shape is a MERGE INTO with
    write.delete.mode=copy-on-write at partition granularity.
    """
    from . import tables

    run_id = run_id or uuid.uuid4().hex[:12]
    if tables.is_table_identifier(out_dir):
        spans_dir = f"{out_dir}_spans"
        lineage_dir = f"{out_dir}_lineage"
    else:
        spans_dir = f"{out_dir}/spans"
        lineage_dir = f"{out_dir}/lineage"

    if not tables.is_table_identifier(out_dir):
        _recover_lineage_swap(lineage_dir)
    prior = tables.read_table(spark, lineage_dir)
    if "num_partitions" not in prior.columns:
        raise ValueError(
            f"{lineage_dir} has no num_partitions column — this output was "
            "not created by a batch run_checkpointed run (streaming-sink "
            "lineage carries batch_id instead) and does not support upsert")
    stored = prior.select(F.max("num_partitions")).first()[0]
    if stored is None:
        raise ValueError(
            f"{lineage_dir} has only null num_partitions values — cannot "
            "recover the salt modulus; this target does not support upsert")
    num_partitions = int(stored)

    salted = with_part_id(updated_docs, num_partitions)
    affected = [int(r.part_id) for r in
                salted.select("part_id").distinct().collect()]
    if not affected:
        return {"run_id": run_id, "parts_touched": 0, "docs_updated": 0}
    updated_ids = salted.select("doc_id").distinct()

    from .extract import make_extract_arrow
    fresh = (salted.repartition(
        min(num_partitions, max(len(affected), 1)), F.xxhash64("doc_id"))
        .mapInArrow(make_extract_arrow(cfg), SPAN_FLAT_SCHEMA))
    existing = (tables.read_table(spark, spans_dir)
                .where(F.col("part_id").isin(affected)))
    kept = existing.join(F.broadcast(updated_ids), "doc_id", "left_anti")
    merged = kept.select(fresh.columns).unionByName(fresh)
    # one materialization: the overwrite deletes the very files `existing`
    # reads, and the lineage aggregate below must not re-run extraction
    merged = merged.localCheckpoint(eager=True)
    tables.write_partitioned(merged, spans_dir, "part_id", spark)

    # dynamic overwrite only touches partitions PRESENT in `merged`: an
    # affected partition whose every doc updated to a zero-span version
    # would keep its stale files on disk — delete those explicitly, and
    # give every affected partition a lineage row (zero row if empty) so
    # lineage and data stay consistent (ADVICE r3).
    present = {int(r.part_id) for r in
               merged.select("part_id").distinct().collect()}
    emptied = sorted(set(affected) - present)
    if emptied:
        if tables.is_table_identifier(out_dir):
            spark.sql(f"DELETE FROM {spans_dir} WHERE part_id IN "
                      f"({','.join(str(p) for p in emptied)})")
        else:
            import shutil
            for pid in emptied:
                shutil.rmtree(f"{spans_dir}/part_id={pid}",
                              ignore_errors=True)

    stats = lineage(merged)
    affected_df = spark.createDataFrame(
        [(p,) for p in affected], "part_id int")
    new_lineage = (
        affected_df.join(stats, "part_id", "left")
        .fillna(0, subset=[c for c in stats.columns if c != "part_id"])
        .withColumn("run_id", F.lit(run_id))
        .withColumn("completed_at", F.current_timestamp())
        .withColumn("num_partitions", F.lit(num_partitions))
    )
    # replace the affected partitions' lineage rows (keep the rest):
    # materialize the merged table BEFORE touching the old files, write to
    # a sibling dir, swap (Iceberg: one MERGE commit does both)
    survivors = prior.where(~F.col("part_id").isin(affected))
    merged_lineage = (survivors.select(new_lineage.columns)
                      .unionByName(new_lineage)
                      .localCheckpoint(eager=True))
    if tables.is_table_identifier(out_dir):
        # Iceberg: one atomic replace commit
        merged_lineage.writeTo(lineage_dir).createOrReplace()
    else:
        merged_lineage.repartition(1).write.mode("overwrite").parquet(
            lineage_dir + "_new")
        import os
        import shutil
        # rename the live table ASIDE first (never delete-then-move): a
        # crash at any step leaves a complete copy under lineage, _old or
        # _new — the rmtree+move it replaces had a window that lost the
        # whole table (ADVICE r3)
        old_dir = lineage_dir + "_old"
        shutil.rmtree(old_dir, ignore_errors=True)  # stale prior crash
        os.rename(lineage_dir, old_dir)
        os.rename(lineage_dir + "_new", lineage_dir)
        shutil.rmtree(old_dir)
    return {
        "run_id": run_id,
        "parts_touched": len(affected),
        "docs_updated": int(updated_ids.count()),
    }
