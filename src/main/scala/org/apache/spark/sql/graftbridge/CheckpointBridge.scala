package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Cleanup hook for `localCheckpoint`-truncated loop rounds.
  *
  * The iterative operators (PageRank, coreness h-index, LPA, BFS,
  * pointer-jump components) truncate each round's lineage with an
  * eager `localCheckpoint`: constant plan size per round (a
  * declarative loop grows the tree linearly, and exponentially when a
  * round references its input twice), rows stay internal-format, and
  * the resulting `LogicalRDD` leaf preserves the materialized plan's
  * output partitioning — unlike the retired `df.rdd` +
  * `createDataFrame` round-trip, which converted every row to external
  * format and erased the partitioning so every next round re-exchanged.
  *
  * What `localCheckpoint` does not give the loop is a way to RELEASE
  * the superseded round: the checkpointed RDD is pinned by the
  * Dataset's plan and `spark.catalog.clearCache()` never touches raw
  * RDD blocks. This bridge reaches into the `LogicalRDD` leaf
  * (`private[sql]`, hence the bridge — same technique as
  * [[ColumnBridge]]) and unpersists its RDD, so a loop holds exactly
  * one node-sized round in memory at a time at any scale, matching
  * the old round-trip's explicit bookkeeping. */
object CheckpointBridge {
  /** Unpersist the checkpoint blocks behind a `localCheckpoint`ed
    * frame (no-op for any other plan shape — never throws: cleanup
    * must not be able to fail a query). */
  def unpersistCheckpointed(df: org.apache.spark.sql.DataFrame): Unit =
    df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
}
