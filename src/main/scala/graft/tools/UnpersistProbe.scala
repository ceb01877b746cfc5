package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r16): does `Dataset.unpersist()` actually free the blocks
  * of a `localCheckpoint(true)` frame?
  *
  * The graph loops (KCore, ConnectedComponents, PageRank) call
  * `.unpersist()` on per-round localCheckpointed frames to release the
  * previous round's blocks. But `Dataset.unpersist` routes through the
  * CacheManager, which only knows frames registered via
  * `Dataset.persist` — a localCheckpoint pins its blocks at the RDD
  * level. If the CacheManager path is a no-op for checkpointed frames,
  * every loop retains ALL rounds' blocks until session end, and the
  * intended release needs the checkpointed RDD itself
  * (`sc.getPersistentRDDs` delta before/after tells the truth).
  */
object UnpersistProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-unpersist-probe").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    def persisted(): Set[Int] = sc.getPersistentRDDs.keySet.toSet

    val base = persisted()
    val df = spark.range(100000).toDF("v").localCheckpoint(true)
    val afterCkpt = persisted() -- base
    println(s"[unpersist-probe] localCheckpoint pinned RDD ids: $afterCkpt")

    df.unpersist(blocking = true)
    val afterUnpersist = persisted() -- base
    println(s"[unpersist-probe] after Dataset.unpersist(true) still pinned: $afterUnpersist")
    println(s"[unpersist-probe] Dataset.unpersist released blocks: ${afterUnpersist.isEmpty}")

    // the RDD-level release path, for comparison
    val df2 = spark.range(100000).toDF("v").localCheckpoint(true)
    val pinned2 = persisted() -- base -- afterUnpersist
    import org.apache.spark.sql.execution.LogicalRDD
    val released = df2.queryExecution.analyzed.collectFirst {
      case l: LogicalRDD => l.rdd.unpersist(blocking = true); l.rdd.id
    }
    val afterRddUnpersist = persisted() -- base -- afterUnpersist
    println(s"[unpersist-probe] second frame pinned: $pinned2, " +
      s"rdd.unpersist on LogicalRDD id=$released, still pinned: $afterRddUnpersist")
    spark.stop()
  }
}
