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
