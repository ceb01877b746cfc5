package graft


import scala.util.chaining._

import graft.sinks.KeyedUpsertSink

class SinkSpec extends GraftSuite {
  import spark.implicits._

  test("upsertSql: C10 shape — GPT columns inserted but not updated") {
    val sql = KeyedUpsertSink.upsertSql("historical_trades",
      keys = Seq("ticket"),
      updateCols = Seq("symbol", "profit"),
      insertOnlyCols = Seq("gpt_summary"))
    assert(sql == "INSERT INTO historical_trades (ticket, symbol, profit, gpt_summary) " +
      "VALUES (?, ?, ?, ?) ON CONFLICT (ticket) " +
      "DO UPDATE SET symbol = EXCLUDED.symbol, profit = EXCLUDED.profit")
  }

  test("upsertSql: insert-only everything → DO NOTHING") {
    val sql = KeyedUpsertSink.upsertSql("t", Seq("k"), Nil, Seq("v"))
    assert(sql.endsWith("ON CONFLICT (k) DO NOTHING"))
  }

  // ---- live JDBC round-trip (embedded Derby — the PG-less stand-in on
  // this classpath; same batched UPDATE→counts→INSERT path runs against
  // any JDBC url) ----

  private def withDerby[A](db: String)(f: java.sql.Connection => A): A = {
    // keep derby.log out of the repo root; must be set before engine boot
    System.setProperty("derby.system.home", "target/derby")
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$db;create=true")
    try f(conn) finally conn.close()
  }

  private def tradeRows(conn: java.sql.Connection, table: String): Map[Long, (String, Double, String)] = {
    val rs = conn.createStatement().executeQuery(
      s"SELECT ticket, symbol, profit, gpt_summary FROM $table")
    val b = Map.newBuilder[Long, (String, Double, String)]
    while (rs.next()) b += rs.getLong(1) -> ((rs.getString(2), rs.getDouble(3), rs.getString(4)))
    b.result()
  }

  test("writeJdbc: live re-upsert — update cols overwrite, GPT cols preserved (C10)") {
    withDerby("sink_c10") { ddl =>
      ddl.createStatement().execute(
        """CREATE TABLE historical_trades (
          ticket BIGINT PRIMARY KEY, symbol VARCHAR(32),
          profit DOUBLE, gpt_summary VARCHAR(64))""")
      val url = "jdbc:derby:memory:sink_c10"
      val b1 = (1L to 100L).map(i => (i, s"s$i", i * 1.0, s"g$i"))
        .toDF("ticket", "symbol", "profit", "gpt_summary").repartition(3)
      KeyedUpsertSink.writeJdbc(b1, "historical_trades", Seq("ticket"),
        Seq("symbol", "profit"), Seq("gpt_summary"), url, batchSize = 16)
      val after1 = tradeRows(ddl, "historical_trades")
      assert(after1.size == 100 && after1(7L) == (("s7", 7.0, "g7")))
      // second upsert: keys 1..50 change every column incl. GPT; 101..110 are new
      val b2 = ((1L to 50L) ++ (101L to 110L)).map(i => (i, s"S$i", i * 2.0, s"G$i"))
        .toDF("ticket", "symbol", "profit", "gpt_summary").repartition(3)
      KeyedUpsertSink.writeJdbc(b2, "historical_trades", Seq("ticket"),
        Seq("symbol", "profit"), Seq("gpt_summary"), url, batchSize = 16)
      val after2 = tradeRows(ddl, "historical_trades")
      assert(after2.size == 110)
      assert(after2(7L) == (("S7", 14.0, "g7")), "update cols overwritten, GPT preserved")
      assert(after2(70L) == (("s70", 70.0, "g70")), "untouched keys unchanged")
      assert(after2(105L) == (("S105", 210.0, "G105")), "new keys insert all cols")
    }
  }

  test("writeJdbc: R10 shape — GPT in the update list is overwritten") {
    withDerby("sink_r10") { ddl =>
      ddl.createStatement().execute(
        """CREATE TABLE rss_trades (
          ticket BIGINT PRIMARY KEY, symbol VARCHAR(32),
          profit DOUBLE, gpt_summary VARCHAR(64))""")
      val url = "jdbc:derby:memory:sink_r10"
      val b1 = Seq((1L, "a", 1.0, "old")).toDF("ticket", "symbol", "profit", "gpt_summary")
      val b2 = Seq((1L, "b", 2.0, "new")).toDF("ticket", "symbol", "profit", "gpt_summary")
      Seq(b1, b2).foreach(KeyedUpsertSink.writeJdbc(_, "rss_trades", Seq("ticket"),
        Seq("symbol", "profit", "gpt_summary"), Nil, url))
      assert(tradeRows(ddl, "rss_trades")(1L) == (("b", 2.0, "new")))
    }
  }

  test("writeJdbc: insert-only everything behaves as DO NOTHING on conflict") {
    withDerby("sink_nop") { ddl =>
      ddl.createStatement().execute(
        "CREATE TABLE meta (k BIGINT PRIMARY KEY, v VARCHAR(32))")
      val url = "jdbc:derby:memory:sink_nop"
      KeyedUpsertSink.writeJdbc(Seq((1L, "first")).toDF("k", "v"),
        "meta", Seq("k"), Nil, Seq("v"), url)
      KeyedUpsertSink.writeJdbc(Seq((1L, "second"), (2L, "other")).toDF("k", "v"),
        "meta", Seq("k"), Nil, Seq("v"), url)
      val rs = ddl.createStatement().executeQuery("SELECT k, v FROM meta ORDER BY k")
      val out = Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getLong(1), r.getString(2))).toSeq
      assert(out == Seq((1L, "first"), (2L, "other")))
    }
  }

  // ---- the literal ON CONFLICT path, executed live: write() sends
  // upsertSql's text through an executor backed by a store that PARSES
  // and applies the statement (MiniConflictStore) — the PG-dialect twin
  // of the Derby runs above, since no ON CONFLICT-speaking engine
  // exists on this offline classpath ----

  test("write + upsertSql executed live: C10 delta — GPT preserved on conflict") {
    MiniConflictStore.createTable("historical_trades",
      Seq("ticket", "symbol", "profit", "gpt_summary"))
    try {
      val exec: KeyedUpsertSink.Executor =
        (sql, batch) => MiniConflictStore.execute(sql, batch)
      val b1 = (1L to 40L).map(i => (i, s"s$i", i * 1.0, s"g$i"))
        .toDF("ticket", "symbol", "profit", "gpt_summary").repartition(3)
      KeyedUpsertSink.write(b1, "historical_trades", Seq("ticket"),
        Seq("symbol", "profit"), Seq("gpt_summary"), exec, batchSize = 7)
      val b2 = ((1L to 20L) ++ (41L to 45L)).map(i => (i, s"S$i", i * 2.0, s"G$i"))
        .toDF("ticket", "symbol", "profit", "gpt_summary").repartition(3)
      KeyedUpsertSink.write(b2, "historical_trades", Seq("ticket"),
        Seq("symbol", "profit"), Seq("gpt_summary"), exec, batchSize = 7)
      val out = MiniConflictStore.rows("historical_trades")
        .map(r => r("ticket") -> r).toMap
      assert(out.size == 45)
      assert(out(7L)("symbol") == "S7" && out(7L)("profit") == 14.0, "update cols overwritten")
      assert(out(7L)("gpt_summary") == "g7", "GPT preserved on conflict (C10)")
      assert(out(33L)("symbol") == "s33", "untouched keys unchanged")
      assert(out(43L)("gpt_summary") == "G43", "new keys insert all cols")
    } finally MiniConflictStore.drop("historical_trades")
  }

  test("write + upsertSql executed live: R10 overwrites GPT, DO NOTHING keeps first") {
    val exec: KeyedUpsertSink.Executor =
      (sql, batch) => MiniConflictStore.execute(sql, batch)
    MiniConflictStore.createTable("rss_trades", Seq("ticket", "gpt_summary"))
    MiniConflictStore.createTable("account_metadata", Seq("k", "v"))
    try {
      // R10: GPT in the update list → last write wins
      Seq((1L, "old")).toDF("ticket", "gpt_summary").pipe(df =>
        KeyedUpsertSink.write(df, "rss_trades", Seq("ticket"), Seq("gpt_summary"), Nil, exec))
      Seq((1L, "new")).toDF("ticket", "gpt_summary").pipe(df =>
        KeyedUpsertSink.write(df, "rss_trades", Seq("ticket"), Seq("gpt_summary"), Nil, exec))
      assert(MiniConflictStore.rows("rss_trades") == Seq(Map("ticket" -> 1L, "gpt_summary" -> "new")))
      // R9 metadata: insert-only everything → DO NOTHING, first write wins
      Seq((1L, "first")).toDF("k", "v").pipe(df =>
        KeyedUpsertSink.write(df, "account_metadata", Seq("k"), Nil, Seq("v"), exec))
      Seq((1L, "second"), (2L, "other")).toDF("k", "v").pipe(df =>
        KeyedUpsertSink.write(df, "account_metadata", Seq("k"), Nil, Seq("v"), exec))
      assert(MiniConflictStore.rows("account_metadata").toSet ==
        Set(Map("k" -> 1L, "v" -> "first"), Map("k" -> 2L, "v" -> "other")))
    } finally { MiniConflictStore.drop("rss_trades"); MiniConflictStore.drop("account_metadata") }
  }

  // ---- single-statement MERGE egress, live on Derby (the MERGE-dialect
  // bulk-upsert twin of the ON CONFLICT path) ----

  test("writeJdbcMerge: live staged MERGE — C10 delta on Derby") {
    withDerby("sink_merge") { ddl =>
      ddl.createStatement().execute(
        """CREATE TABLE m_trades (
          ticket BIGINT PRIMARY KEY, symbol VARCHAR(32),
          profit DOUBLE, gpt_summary VARCHAR(64))""")
      val url = "jdbc:derby:memory:sink_merge"
      val b1 = (1L to 100L).map(i => (i, s"s$i", i * 1.0, s"g$i"))
        .toDF("ticket", "symbol", "profit", "gpt_summary").repartition(3)
      KeyedUpsertSink.writeJdbcMerge(b1, "m_trades", Seq("ticket"),
        Seq("symbol", "profit"), Seq("gpt_summary"), url, batchSize = 16)
      val after1 = tradeRows(ddl, "m_trades")
      assert(after1.size == 100 && after1(7L) == (("s7", 7.0, "g7")))
      val b2 = ((1L to 50L) ++ (101L to 110L)).map(i => (i, s"S$i", i * 2.0, s"G$i"))
        .toDF("ticket", "symbol", "profit", "gpt_summary").repartition(3)
      KeyedUpsertSink.writeJdbcMerge(b2, "m_trades", Seq("ticket"),
        Seq("symbol", "profit"), Seq("gpt_summary"), url, batchSize = 16)
      val after2 = tradeRows(ddl, "m_trades")
      assert(after2.size == 110)
      assert(after2(7L) == (("S7", 14.0, "g7")), "update cols overwritten, GPT preserved")
      assert(after2(70L) == (("s70", 70.0, "g70")), "untouched keys unchanged")
      assert(after2(105L) == (("S105", 210.0, "G105")), "new keys insert all cols")
      // no scratch tables left behind
      val rs = ddl.getMetaData.getTables(null, null, "M_TRADES_STG%", null)
      assert(!rs.next(), "staging tables must be dropped")
    }
  }

  test("writeJdbcMerge: DO NOTHING shape (no update cols) keeps first writer") {
    withDerby("sink_merge_nop") { ddl =>
      ddl.createStatement().execute(
        "CREATE TABLE m_meta (k BIGINT PRIMARY KEY, v VARCHAR(32))")
      val url = "jdbc:derby:memory:sink_merge_nop"
      KeyedUpsertSink.writeJdbcMerge(Seq((1L, "first")).toDF("k", "v"),
        "m_meta", Seq("k"), Nil, Seq("v"), url)
      KeyedUpsertSink.writeJdbcMerge(Seq((1L, "second"), (2L, "other")).toDF("k", "v"),
        "m_meta", Seq("k"), Nil, Seq("v"), url)
      val rs = ddl.createStatement().executeQuery("SELECT k, v FROM m_meta ORDER BY k")
      val out = Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getLong(1), r.getString(2))).toSeq
      assert(out == Seq((1L, "first"), (2L, "other")))
    }
  }

  test("mergeSql: statement shapes") {
    assert(KeyedUpsertSink.mergeSql("t", "t_stg_0", Seq("k"), Seq("a", "b"), Seq("g")) ==
      "MERGE INTO t t USING t_stg_0 s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET a = s.a, b = s.b " +
        "WHEN NOT MATCHED THEN INSERT (k, a, b, g) VALUES (s.k, s.a, s.b, s.g)")
    assert(!KeyedUpsertSink.mergeSql("t", "stg", Seq("k"), Nil, Seq("v"))
      .contains("WHEN MATCHED"), "no update cols -> no WHEN MATCHED branch")
  }

  test("scratchPrefix: 40-byte bound, multibyte-safe, no trailing surrogate") {
    assert(KeyedUpsertSink.scratchPrefix("short") == "short")
    assert(KeyedUpsertSink.scratchPrefix("x" * 80) == "x" * 40)
    // 2-byte chars: 40 chars = 80 bytes, must trim to 20 chars
    val twoByte = "é" * 80
    val p2 = KeyedUpsertSink.scratchPrefix(twoByte)
    assert(p2.getBytes("UTF-8").length <= 40 && p2 == "é" * 20)
    // 4-byte (surrogate-pair) chars: 40 bytes = 10 chars; a cut that
    // lands mid-pair must not leave a lone high surrogate
    val emoji = "🚀" * 40
    val p4 = KeyedUpsertSink.scratchPrefix(emoji)
    assert(p4.getBytes("UTF-8").length <= 40)
    assert(!Character.isHighSurrogate(p4.last))
    // mixed: 39 ASCII bytes + a surrogate pair straddling the bound
    val mixed = ("a" * 39) + "🚀🚀🚀"
    val pm = KeyedUpsertSink.scratchPrefix(mixed)
    assert(pm.getBytes("UTF-8").length <= 40 && !Character.isHighSurrogate(pm.last))
    assert(pm.startsWith("a" * 39))
  }

  test("write: partition-parallel batching delivers every row once") {
    // closures serialize per task even in local mode — capture through an
    // accumulator, the supported executor→driver channel
    val acc = spark.sparkContext.collectionAccumulator[Seq[Any]]("captured")
    val df = (1 to 250).map(i => (i.toLong, s"s$i", i * 1.5))
      .toDF("ticket", "symbol", "profit").repartition(4)
    KeyedUpsertSink.write(df, "t", Seq("ticket"), Seq("symbol", "profit"), Nil,
      executor = (sql, batch) => {
        assert(sql.startsWith("INSERT INTO t (ticket, symbol, profit)"))
        assert(batch.size <= 100)
        batch.foreach(acc.add)
      },
      batchSize = 100)
    import scala.jdk.CollectionConverters._
    val rows = acc.value.asScala.toSeq
    assert(rows.size == 250)
    assert(rows.map(_.head.asInstanceOf[Long]).sorted == (1L to 250L))
  }
}
