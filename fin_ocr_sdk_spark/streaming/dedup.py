"""Streaming exact-dedup — a training-data-pipeline operator, NOT
reference parity (the reference's only stream is the video loop;
see streaming/video.py).  Continuous document ingest at corpus scale
needs first-occurrence-wins dedup across micro-batches, which is a
custom stateful operator: Spark's dropDuplicates state never expires
without event-time columns the ingest rows may lack.

Implementation: ``applyInPandasWithState`` keyed by a 16-bit prefix of
sha256(text).  The key space (65,536 groups) bounds per-task state and
spreads the shuffle; each group's state is the set of full digests seen
so far, so collisions across texts are impossible and state size is
32 bytes per distinct document in the group — at 10^12 docs state
shards across executors by group and survives restarts through the
checkpoint.  Only the first occurrence of each digest (per arrival
order within the batch: lowest doc_id wins inside one batch, earlier
batch wins across batches) is emitted.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, LongType, StringType,
                               StructField, StructType)

DOC_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
])

OUT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("digest", StringType()),
])

STATE_SCHEMA = StructType([
    StructField("seen", ArrayType(StringType())),
])


#: digest sentinel for NULL text.  The Spark-side group key
#: ``sha2(NULL, 256)`` is NULL, so every NULL-text row lands in the one
#: NULL-keyed group; hashing ``str(None)`` instead would collide with a
#: document whose text is literally "None" while living in a different
#: group (a dedup miss both ways).  STATE-FORMAT NOTE: streams
#: checkpointed before this sentinel existed recorded sha256("None")
#: for null-text rows; _dedup_group keeps that digest as a legacy
#: alias when loading the NULL-keyed group's state, so resuming a
#: pre-sentinel checkpoint cannot re-emit a null-text arrival.
_NULL_DIGEST = "<null>"

#: what pre-sentinel builds recorded for null text (str(None) hashed).
#: Safe to alias inside the NULL-keyed group only: a document whose
#: text is literally "None" produces this digest too, but lives in the
#: sha2('None')-prefixed group, never the NULL-keyed one.
_LEGACY_NULL_DIGEST = hashlib.sha256(b"None").hexdigest()


def _dedup_group(key, pdfs, state):
    import pandas as pd
    seen = set(state.get[0]) if state.exists else set()
    if key[0] is None and _LEGACY_NULL_DIGEST in seen:
        seen.add(_NULL_DIGEST)
    # applyInPandasWithState may deliver one group's micro-batch as
    # MULTIPLE chunks; "lowest doc_id wins inside a batch" only holds if
    # all chunks are accumulated before the single sort.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    out_ids: list[int] = []
    out_digests: list[str] = []
    if chunks:
        rows = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
        for doc_id, text in zip(rows["doc_id"], rows["text"]):
            if text is None or (isinstance(text, float) and pd.isna(text)):
                digest = _NULL_DIGEST
            else:
                digest = hashlib.sha256(text.encode()).hexdigest()
            if digest in seen:
                continue
            seen.add(digest)
            out_ids.append(int(doc_id))
            out_digests.append(digest)
    state.update((sorted(seen),))
    yield pd.DataFrame({"doc_id": out_ids, "digest": out_digests})


def dedup_stream(spark: SparkSession, input_dir: str,
                 max_files_per_trigger: int = 1,
                 output_mode: str = "update") -> DataFrame:
    """The streaming dedup plan over a parquet ingest dir: group by the
    digest prefix, keep first occurrences via per-group state.  Each
    first occurrence is emitted exactly once, so the operator is valid
    in both "update" (foreachBatch drains) and "append" (file sinks)
    output modes."""
    stream = (spark.readStream.schema(DOC_SCHEMA)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(input_dir))
    keyed = stream.withColumn(
        "k", F.substring(F.sha2(F.col("text"), 256), 1, 4))
    from pyspark.sql.streaming.state import GroupStateTimeout
    return keyed.groupBy("k").applyInPandasWithState(
        _dedup_group, OUT_SCHEMA, STATE_SCHEMA, output_mode,
        GroupStateTimeout.NoTimeout)


def run_dedup_to_parquet(spark: SparkSession, input_dir: str,
                         output_dir: str, checkpoint_dir: str,
                         max_files_per_trigger: int = 1) -> None:
    """Production sink: append the first-occurrence (doc_id, digest)
    rows to a parquet table — no driver collect, unlike the
    run_dedup_drain test helper below.  availableNow + checkpoint =
    incremental batch runs: a rerun over a grown ingest dir processes
    only new files and keeps already-emitted digests deduplicated."""
    q = (dedup_stream(spark, input_dir, max_files_per_trigger,
                      output_mode="append")
         .writeStream.outputMode("append").format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def run_dedup_drain(spark: SparkSession, input_dir: str,
                    checkpoint_dir: str,
                    max_files_per_trigger: int = 1) -> list[dict]:
    """Test/drain helper (collects every emitted row to the driver —
    use run_dedup_to_parquet as the production pattern): drain
    everything currently in `input_dir` through the stateful dedup
    (availableNow) and return the emitted first-occurrence rows in
    arrival order.  The checkpoint dir makes a second invocation resume
    the state: documents already emitted in a previous run stay
    deduplicated."""
    rows: list[dict] = []

    def collect(batch_df: DataFrame, batch_id: int) -> None:
        rows.extend(r.asDict() for r in batch_df.collect())

    q = (dedup_stream(spark, input_dir, max_files_per_trigger)
         .writeStream.outputMode("update").foreachBatch(collect)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return rows
