package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** The reference's egress: keyed `INSERT … ON CONFLICT … DO UPDATE` into
  * a relational store (`CSV PARSER/gcp_csv.py:38-67,160-193`,
  * `RSS PARSER/gcp_rss.py:66-80,114-170`).
  *
  * Distributed shape: `foreachPartition` — one connection and one
  * prepared statement per partition, rows written in `batchSize` batches
  * (the reference's `executemany` per file becomes executemany per
  * partition-batch; its row-at-a-time RSS writes disappear). Partition
  * count = writer concurrency, so DOP is a `repartition(n)` away instead
  * of a thread-pool constant.
  *
  * The statement EXECUTION is pluggable (`Executor`) so the SQL assembly
  * and batching — the semantics — are unit-testable without a database,
  * and the same sink drives any JDBC target. `Merge.upsert` is the
  * engine-native twin for relational targets; this sink is the boundary
  * adapter for external keyed stores.
  */
object KeyedUpsertSink {

  /** Executes one statement with a batch of parameter rows (e.g. JDBC
    * addBatch/executeBatch inside). Must be serializable — it runs on
    * executors. */
  type Executor = (String, Seq[Seq[Any]]) => Unit

  /** ON CONFLICT statement with the reference's column semantics:
    * update-listed columns overwrite on conflict; insert-only columns
    * (C10's GPT enrichment) are written on insert and preserved on
    * conflict by omission from the UPDATE SET list. */
  def upsertSql(table: String, keys: Seq[String], updateCols: Seq[String],
                insertOnlyCols: Seq[String]): String = {
    val all = keys ++ updateCols ++ insertOnlyCols
    val placeholders = all.map(_ => "?").mkString(", ")
    val sets = updateCols.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    val action = if (updateCols.isEmpty) "DO NOTHING" else s"DO UPDATE SET $sets"
    s"INSERT INTO $table (${all.mkString(", ")}) VALUES ($placeholders) " +
      s"ON CONFLICT (${keys.mkString(", ")}) $action"
  }

  /** Writes `df` through `executor` partition-parallel in batches. */
  def write(df: DataFrame, table: String, keys: Seq[String],
            updateCols: Seq[String], insertOnlyCols: Seq[String],
            executor: Executor, batchSize: Int = 1000): Unit = {
    val cols = keys ++ updateCols ++ insertOnlyCols
    val sql = upsertSql(table, keys, updateCols, insertOnlyCols)
    val idx = cols.map(c => df.columns.indexOf(c))
    require(idx.forall(_ >= 0), s"missing sink columns: " +
      cols.zip(idx).collect { case (c, -1) => c }.mkString(", "))
    df.foreachPartition { (rows: Iterator[Row]) =>
      rows.grouped(batchSize).foreach { batch =>
        executor(sql, batch.map(r => idx.map(r.get)))
      }
    }
  }
}
