package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One keyed event row entering the tracker. */
case class ShardEvent(event_type: String, event_id: Long)

/** Per-shard consumed-row count — the Spark `GroupState` equivalent of the
  * reference's Flink `ValueState<Integer>` offset
  * (SnowflakeProcessFunction.java:33,88-122). */
case class ShardOffset(consumed: Long)

/** A row the tracker released, with its per-shard sequence number. */
case class SeqRow(event_id: Long, event_type: String, seq: Long)

/** Stateful per-shard offset tracking over a keyed stream: each shard
  * (event_type) carries a running consumed-row count across micro-batches;
  * rows are sequence-numbered within their shard and only rows beyond the
  * shard's initial stored offset are emitted — exactly the reference's
  * "advance the offset, emit only new rows" incremental-read contract,
  * re-expressed as `flatMapGroupsWithState`.
  *
  * Scale: state is O(shards) (one counter per shard); each micro-batch
  * shuffles once by shard key, like Flink's `keyBy` (StreamingJob.java:109).
  * Rows are ordered within the group by `event_id` before numbering so the
  * sequence assignment is deterministic under file-source batching.
  */
object OffsetTracker {

  def track(events: Dataset[ShardEvent], initialOffsets: Map[String, Long]): Dataset[SeqRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[ShardOffset, SeqRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: String, rows: Iterator[ShardEvent], state: GroupState[ShardOffset]) =>
          val consumed = state.getOption.map(_.consumed).getOrElse(0L)
          val stored = initialOffsets.getOrElse(shard, 0L)
          val batch = rows.toVector.sortBy(_.event_id)
          state.update(ShardOffset(consumed + batch.size))
          batch.iterator.zipWithIndex.collect {
            case (e, i) if consumed + i + 1 > stored =>
              SeqRow(e.event_id, shard, consumed + i + 1)
          }
      }
  }
}
