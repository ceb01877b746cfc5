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
    val idx = colIndexes(df, cols)
    df.foreachPartition { (rows: Iterator[Row]) =>
      rows.grouped(batchSize).foreach { batch =>
        executor(sql, batch.map(r => idx.map(r.get)))
      }
    }
  }

  /** ANSI twin of `upsertSql` for stores without ON CONFLICT (Derby,
    * H2, DB2 …): batched `UPDATE` first, then the rows whose update
    * count came back 0 are batch-`INSERT`ed. Same column semantics —
    * update-listed columns overwrite, insert-only columns are written
    * on insert and preserved on update by omission from the SET list.
    * Parameter order: updateCols ++ keys. With no update columns the
    * statement degrades to a key-presence probe (self-assign) so the
    * insert filter still works — the DO NOTHING shape. */
  def ansiUpdateSql(table: String, keys: Seq[String],
                    updateCols: Seq[String]): String = {
    val sets =
      if (updateCols.isEmpty) s"${keys.head} = ${keys.head}" // presence probe
      else updateCols.map(c => s"$c = ?").mkString(", ")
    s"UPDATE $table SET $sets WHERE " + keys.map(c => s"$c = ?").mkString(" AND ")
  }

  /** Plain insert of every sink column; parameter order keys ++
    * updateCols ++ insertOnlyCols. */
  def ansiInsertSql(table: String, keys: Seq[String], updateCols: Seq[String],
                    insertOnlyCols: Seq[String]): String = {
    val all = keys ++ updateCols ++ insertOnlyCols
    s"INSERT INTO $table (${all.mkString(", ")}) VALUES " +
      s"(${all.map(_ => "?").mkString(", ")})"
  }

  /** LIVE JDBC egress — the end-to-end form of the reference's keyed
    * upsert (`CSV PARSER/gcp_csv.py:51`, `RSS PARSER/gcp_rss.py:72,129`)
    * against any JDBC store, ON CONFLICT or not: one connection and two
    * prepared statements per partition, each batch running UPDATE for
    * every row and INSERT for exactly the rows the JDBC update counts
    * prove absent. One commit per partition (R12's single-commit
    * visibility: a partition's rows appear all at once or not at all).
    *
    * Precondition: keys are unique within `df` — the reference
    * pipeline guarantees this (C9's keep-first dedup runs upstream of
    * C10's merge); concurrent partitions upserting the SAME key would
    * race their existence checks.
    *
    * Supported dialects: any JDBC driver that reports EXACT MATCHED-row
    * counts for batched UPDATEs (PostgreSQL, Derby, H2, Oracle, SQL
    * Server, and MySQL/MariaDB in their DEFAULT found-rows mode). Out
    * of contract and rejected at connect time: MySQL/MariaDB with
    * `useAffectedRows=true` (a matched-but-unchanged UPDATE reports 0,
    * silently turning into a duplicate INSERT); rejected per batch:
    * drivers returning SUCCESS_NO_INFO (e.g. MySQL with
    * `rewriteBatchedStatements=true`). Both fail loudly rather than
    * lose or duplicate rows.
    *
    * At scale: partition count = writer DOP (`repartition(n)` upstream);
    * the two-statement probe is one round-trip pair per `batchSize`
    * rows, same order as executemany. */
  def writeJdbc(df: DataFrame, table: String, keys: Seq[String],
                updateCols: Seq[String], insertOnlyCols: Seq[String],
                url: String, connProps: Map[String, String] = Map.empty,
                batchSize: Int = 1000): Unit = {
    val cols = keys ++ updateCols ++ insertOnlyCols
    val keyIdx = colIndexes(df, keys)
    val updIdx = colIndexes(df, updateCols)
    val insIdx = colIndexes(df, cols)
    val updSql = ansiUpdateSql(table, keys, updateCols)
    val insSql = ansiInsertSql(table, keys, updateCols, insertOnlyCols)
    df.foreachPartition { (rows: Iterator[Row]) =>
      val props = new java.util.Properties()
      connProps.foreach { case (k, v) => props.setProperty(k, v) }
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        // Affected-rows mode makes a matched-but-unchanged UPDATE report
        // 0, which the probe below would read as "absent" → duplicate
        // INSERT. Detectable up front for MySQL/MariaDB (the dialects
        // with the mode): reject the connection, don't corrupt the table.
        val product = conn.getMetaData.getDatabaseProductName.toLowerCase
        val affectedRowsMode =
          url.toLowerCase.contains("useaffectedrows=true") ||
            connProps.exists { case (k, v) =>
              k.equalsIgnoreCase("useAffectedRows") && v.equalsIgnoreCase("true") }
        require(!((product.contains("mysql") || product.contains("maria")) &&
            affectedRowsMode),
          s"KeyedUpsertSink.writeJdbc requires MATCHED-row update counts; " +
            s"$product with useAffectedRows=true reports affected rows " +
            "(matched-but-unchanged = 0), which would duplicate existing keys " +
            "— drop useAffectedRows or use the default found-rows mode")
        conn.setAutoCommit(false)
        val upd = conn.prepareStatement(updSql)
        val ins = conn.prepareStatement(insSql)
        rows.grouped(batchSize).foreach { batch =>
          batch.foreach { r =>
            var p = 1
            updIdx.foreach { i => upd.setObject(p, r.get(i)); p += 1 }
            keyIdx.foreach { i => upd.setObject(p, r.get(i)); p += 1 }
            upd.addBatch()
          }
          val counts = upd.executeBatch()
          // The update-then-insert probe is only sound when the driver
          // reports EXACT per-row matched counts. SUCCESS_NO_INFO (-2,
          // e.g. MySQL with rewriteBatchedStatements) would silently
          // skip every needed INSERT — fail loudly instead of losing
          // rows. (Drivers in affected-rows mode are likewise out of
          // contract: a matched-but-unchanged UPDATE reports 0.)
          require(counts.forall(_ != java.sql.Statement.SUCCESS_NO_INFO),
            "JDBC driver returned SUCCESS_NO_INFO for a batched UPDATE; " +
              "KeyedUpsertSink requires exact update counts " +
              "(disable batch rewriting or use a PG-dialect store)")
          batch.iterator.zip(counts.iterator).foreach { case (r, n) =>
            if (n == 0) {
              insIdx.zipWithIndex.foreach { case (i, j) => ins.setObject(j + 1, r.get(i)) }
              ins.addBatch()
            }
          }
          ins.executeBatch()
        }
        conn.commit()
      } catch {
        case e: Throwable =>
          // A failed rollback (e.g. dead connection) must not mask the
          // root-cause batch failure.
          try conn.rollback()
          catch { case r: Throwable => e.addSuppressed(r) }
          throw e
      } finally conn.close()
    }
  }

  /** The set-based MERGE statement [[writeJdbcMerge]] applies per
    * partition: one conflict-handling statement over a staged batch.
    * Column semantics identical to [[upsertSql]] — update columns
    * overwrite on match, insert-only columns are written on insert and
    * preserved on match by omission from the UPDATE SET list, and no
    * update columns means no WHEN MATCHED branch at all (the DO NOTHING
    * shape). Exposed for unit tests and for stores where the caller
    * manages staging itself. */
  /** Readable prefix of a scratch-table name, bounded to 40 UTF-8
    * BYTES (PostgreSQL truncates identifiers at NAMEDATALEN-1 = 63
    * bytes, not chars; 40 + "_stg_" + 16-hex suffix = 61 ≤ 63). A
    * byte-bounded trim can cut between a surrogate pair, so a trailing
    * lone high surrogate is dropped too. Exposed for unit tests. */
  def scratchPrefix(table: String): String = {
    var prefix = table.take(40)
    while (prefix.getBytes("UTF-8").length > 40)
      prefix = prefix.substring(0, prefix.length - 1)
    if (prefix.nonEmpty && Character.isHighSurrogate(prefix.last))
      prefix = prefix.substring(0, prefix.length - 1)
    prefix
  }

  def mergeSql(table: String, staging: String, keys: Seq[String],
               updateCols: Seq[String], insertOnlyCols: Seq[String]): String = {
    val cols = keys ++ updateCols ++ insertOnlyCols
    val onCond = keys.map(k => s"t.$k = s.$k").mkString(" AND ")
    val matched =
      if (updateCols.isEmpty) ""
      else "WHEN MATCHED THEN UPDATE SET " +
        updateCols.map(c => s"$c = s.$c").mkString(", ") + " "
    s"MERGE INTO $table t USING $staging s ON $onCond " + matched +
      s"WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(c => s"s.$c").mkString(", ")})"
  }

  /** Staging-table MERGE egress — the bulk-upsert shape for
    * MERGE-dialect stores with TRANSACTIONAL DDL (Derby, DB2,
    * PostgreSQL ≥15): each partition batch-INSERTs its rows into a
    * private scratch table, applies ONE set-based [[mergeSql]]
    * statement, drops the scratch table, and commits — all in one
    * transaction, so a partition's rows appear atomically (R12
    * single-commit visibility) and a failed attempt's rollback also
    * undoes its scratch CREATE (no leftover sweep needed). Oracle and
    * SQL Server are OUT of this contract: both auto-commit DDL (which
    * would break the single-transaction atomicity above) and neither
    * accepts `CREATE TABLE … AS SELECT … WITH NO DATA` — supporting
    * them needs dialect-specific scratch DDL plus a real leftover
    * sweep, loudly absent rather than silently wrong here.
    *
    * At scale this is the PREFERRED relational egress: [[writeJdbc]]'s
    * per-row UPDATE→counts→INSERT probe becomes one bulk load plus one
    * merge the store can plan as a JOIN — the same batch-vs-row
    * asymmetry the reference exploits with executemany
    * (`CSV PARSER/gcp_csv.py:51`, `RSS PARSER/gcp_rss.py:72`). It also
    * has no dependence on JDBC update-count semantics, so the
    * affected-rows/SUCCESS_NO_INFO contract of [[writeJdbc]] does not
    * apply. Scratch tables are `<table≤40>_stg_<hash16>` where the
    * 16-hex suffix hashes (full table, appId, taskAttemptId) — bounded
    * at 61 chars so PostgreSQL's 63-byte identifier truncation can
    * never cut the uniquifying part off — created via CREATE TABLE …
    * AS … WITH NO DATA from the target's own schema, so concurrent
    * partitions, speculative duplicate attempts, AND concurrent
    * applications writing the same target never share staging state;
    * same unique-key precondition as [[writeJdbc]]. */
  def writeJdbcMerge(df: DataFrame, table: String, keys: Seq[String],
                updateCols: Seq[String], insertOnlyCols: Seq[String],
                url: String, connProps: Map[String, String] = Map.empty,
                batchSize: Int = 1000): Unit = {
    val cols = keys ++ updateCols ++ insertOnlyCols
    val insIdx = colIndexes(df, cols)
    // taskAttemptId is unique only WITHIN one Spark application — two
    // concurrent applications merging into the same target both count
    // attempts from 0, so the scratch name also carries an app-unique
    // component (sanitized applicationId tail), captured on the driver.
    val appTag = df.sparkSession.sparkContext.applicationId
      .replaceAll("[^A-Za-z0-9]", "").takeRight(16)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        // Attempt-unique scratch name: a speculative/retried duplicate
        // attempt of the same partition (or a concurrent job on the same
        // target) must not DROP/CREATE the other's staging table mid-
        // merge — partitionId alone would collide exactly there.
        // BOUNDED length: PostgreSQL silently truncates identifiers at
        // 63 bytes, which would cut the uniquifying suffix off a long
        // target name and re-open the very collision appTag prevents.
        // Hash (full table, appTag, attempt) into a fixed 16-hex suffix
        // and cap the readable prefix at 40 BYTES (PostgreSQL's 63-char
        // identifier limit is NAMEDATALEN-1 bytes, not chars — a
        // multibyte prefix truncated by char count could spill into and
        // cut the uniquifying suffix): 40+5+16 = 61 <= 63; the hash
        // covers the UNtruncated table name, so two long targets
        // sharing a 40-byte prefix still get distinct scratch.
        val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
        val md = java.security.MessageDigest.getInstance("MD5")
        val tag = md.digest(s"$table|$appTag|$attempt".getBytes("UTF-8"))
          .take(8).map("%02x".format(_)).mkString
        val stg = s"${KeyedUpsertSink.scratchPrefix(table)}_stg_$tag"
        val props = new java.util.Properties()
        connProps.foreach { case (k, v) => props.setProperty(k, v) }
        val conn = java.sql.DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val st = conn.createStatement()
          // No pre-CREATE leftover sweep: the scratch name is attempt-
          // unique, so a failed EARLIER attempt's table (different
          // attempt id) could never collide with ours — and on the
          // transactional-DDL stores this contract covers, that failed
          // attempt's rollback already dropped its scratch anyway.
          st.execute(s"CREATE TABLE $stg AS SELECT ${cols.mkString(", ")} " +
            s"FROM $table WITH NO DATA")
          val ins = conn.prepareStatement(
            s"INSERT INTO $stg (${cols.mkString(", ")}) " +
              s"VALUES (${cols.map(_ => "?").mkString(", ")})")
          rows.grouped(batchSize).foreach { batch =>
            batch.foreach { r =>
              insIdx.zipWithIndex.foreach { case (i, j) => ins.setObject(j + 1, r.get(i)) }
              ins.addBatch()
            }
            ins.executeBatch()
          }
          st.execute(mergeSql(table, stg, keys, updateCols, insertOnlyCols))
          st.execute(s"DROP TABLE $stg")
          conn.commit()
        } catch {
          case e: Throwable =>
            try conn.rollback()
            catch { case r: Throwable => e.addSuppressed(r) }
            throw e
        } finally conn.close()
      }
    }
  }

  private def colIndexes(df: DataFrame, cols: Seq[String]): Seq[Int] = {
    val idx = cols.map(c => df.columns.indexOf(c))
    require(idx.forall(_ >= 0), s"missing sink columns: " +
      cols.zip(idx).collect { case (c, -1) => c }.mkString(", "))
    idx
  }
}
