package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection:
  * shingle → minhash signature → band → bucket equi-join → exact-Jaccard
  * verification of candidates.
  *
  * The classic pipeline (Broder '97; MMDS ch.3) in pure relational form:
  *  1. k-char shingles of normalized text (distinct set per doc)
  *  2. n minhashes: min over shingles of a seeded hash; here the hash is
  *     `md5(seed ‖ shingle)` compared lexicographically, which is
  *     engine-portable (string min) and collision-adequate for banding
  *  3. bands of r signatures hashed together → candidate buckets
  *  4. candidates = self-equi-join on (band, bucket) — this is the scale
  *     step: no all-pairs comparison, one shuffle on the band hash
  *  5. verification = exact Jaccard over the distinct shingle sets
  *
  * At 100 TB: step 4's join keys are uniformly-distributed hashes, so the
  * shuffle partitions evenly; mega-buckets (boilerplate docs) are the one
  * skew risk — cap bucket width or salt. For production throughput swap
  * md5-string min for `xxhash64` longs (same plan shape, cheaper hash);
  * the md5 form is kept because it is reproducible in the DuckDB oracle.
  */
object MinHashDedup {

  /** Distinct k-char shingles of the first `maxChars` of `c`. */
  def shingles(c: Column, k: Int = 5, maxChars: Int = 200): Column = {
    val s = substring(c, 1, maxChars)
    array_distinct(transform(
      sequence(lit(1), greatest(length(s) - (k - 1), lit(1))),
      i => s.substr(i, lit(k))))
  }

  /** Minhash j = lexicographic min of md5(j ‖ shingle). */
  def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, x => md5(concat(lit(s"$seed|"), x))))

  /** Candidate pairs via banding. Input must carry `idCol` (orderable,
    * unique) and `shCol` (distinct shingle array). */
  def candidatePairs(docs: DataFrame, idCol: String, shCol: String,
                     nHashes: Int = 8, bands: Int = 4): DataFrame = {
    val rows = bands
    require(nHashes % bands == 0, "bands must divide nHashes")
    val r = nHashes / bands
    val sig = docs.select(
      col(idCol) +: col(shCol) +:
        (0 until nHashes).map(j => minhash(col(shCol), j).as(s"mh$j")): _*)
    val banded = sig.select(
      col(idCol),
      explode(array((0 until rows).map { b =>
        struct(lit(b).as("band"),
          md5(concat_ws("", (0 until r).map(i => col(s"mh${b * r + i}")): _*)).as("bucket"))
      }: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard over distinct shingle arrays (verification step). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(filter(a, x => array_contains(b, x))).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Full near-dup pipeline: pairs with Jaccard ≥ `threshold`. */
  def nearDuplicates(docs: DataFrame, idCol: String, textNorm: Column,
                     threshold: Double, k: Int = 5, maxChars: Int = 200,
                     nHashes: Int = 8, bands: Int = 4): DataFrame = {
    val withSh = docs.select(col(idCol), shingles(textNorm, k, maxChars).as("__sh"))
    val pairs = candidatePairs(withSh, idCol, "__sh", nHashes, bands)
    pairs
      .join(withSh.withColumnRenamed(idCol, "id_a").withColumnRenamed("__sh", "sh_a"), "id_a")
      .join(withSh.withColumnRenamed(idCol, "id_b").withColumnRenamed("__sh", "sh_b"), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
