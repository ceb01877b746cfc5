package graft


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
