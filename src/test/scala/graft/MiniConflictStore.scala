package graft

import scala.collection.mutable

/** Minimal LIVE keyed store that EXECUTES the exact parameterized
  * `INSERT … ON CONFLICT …` statement text `KeyedUpsertSink.upsertSql`
  * emits — PostgreSQL's conflict grammar, which no embedded engine on
  * this (offline) classpath speaks: Derby/the Spark jars ship no H2,
  * no SQLite, and Derby's dialect is MERGE (covered live by
  * `writeJdbcMerge`). Rather than string-compare the SQL, this store
  * PARSES the statement and applies its semantics — DO NOTHING vs
  * DO UPDATE SET c = EXCLUDED.c — against in-memory tables, so
  * `KeyedUpsertSink.write` drives a real conflict-resolution execution
  * path end-to-end: a statement whose text drifts from the grammar, or
  * whose EXCLUDED semantics are mis-assembled, fails loudly here.
  *
  * JVM-singleton state: tasks of a local-mode Spark job all mutate the
  * same store through the serializable executor lambda (the sink's
  * unique-keys precondition makes concurrent per-key writes disjoint);
  * per-table apply is synchronized for cross-partition visibility.
  */
object MiniConflictStore {

  private final class Table(val cols: Seq[String]) {
    val rows = mutable.LinkedHashMap[Seq[Any], Array[Any]]()
  }

  private val tables = new java.util.concurrent.ConcurrentHashMap[String, Table]()

  def createTable(name: String, cols: Seq[String]): Unit =
    tables.put(name, new Table(cols))

  def drop(name: String): Unit = tables.remove(name)

  /** Rows of `name` as colName→value maps, insertion-ordered. */
  def rows(name: String): Seq[Map[String, Any]] = {
    val t = tables.get(name)
    require(t != null, s"no such table: $name")
    t.synchronized {
      t.rows.values.map(r => t.cols.zip(r).toMap).toSeq
    }
  }

  private val Grammar =
    """(?s)INSERT INTO (\w+) \(([^)]*)\) VALUES \(([?, ]*)\) ON CONFLICT \(([^)]*)\) (DO NOTHING|DO UPDATE SET .*)""".r

  /** Execute one parameterized statement for a batch of parameter rows —
    * the `KeyedUpsertSink.Executor` shape. */
  def execute(sql: String, batch: Seq[Seq[Any]]): Unit = sql match {
    case Grammar(tbl, colList, qMarks, keyList, action) =>
      val cols = colList.split(",").map(_.trim).toSeq
      require(qMarks.count(_ == '?') == cols.size,
        s"placeholder/column arity mismatch in: $sql")
      val keys = keyList.split(",").map(_.trim).toSeq
      require(keys.forall(cols.contains), s"conflict keys $keys not all in $cols")
      // DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b → the update list;
      // every assignment must be the canonical EXCLUDED self-reference.
      val updates: Seq[String] =
        if (action == "DO NOTHING") Nil
        else action.stripPrefix("DO UPDATE SET ").split(",").map(_.trim).toSeq
          .map { a =>
            a.split("=").map(_.trim) match {
              case Array(c, e) if e == s"EXCLUDED.$c" && cols.contains(c) => c
              case _ => sys.error(s"unsupported assignment '$a' in: $sql")
            }
          }
      val t = tables.get(tbl)
      require(t != null, s"no such table: $tbl")
      require(t.cols.sorted == cols.sorted, s"column set mismatch for $tbl")
      val keyIdxInsert = keys.map(cols.indexOf)
      t.synchronized {
        batch.foreach { params =>
          require(params.size == cols.size, "param arity mismatch")
          val key = keyIdxInsert.map(params)
          t.rows.get(key) match {
            case None =>
              // store in TABLE column order, whatever the statement order
              val byName = cols.zip(params).toMap
              t.rows.put(key, t.cols.map(byName).toArray)
            case Some(existing) =>
              val byName = cols.zip(params).toMap
              updates.foreach { c => existing(t.cols.indexOf(c)) = byName(c) }
          }
        }
      }
    case _ => sys.error(s"statement outside the ON CONFLICT grammar: $sql")
  }
}
