package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection:
  * shingle → minhash signature → band → bucket equi-join → exact-Jaccard
  * verification of candidates.
  *
  * The classic pipeline (Broder '97; MMDS ch.3) in pure relational form:
  *  1. k-char shingles of normalized text (distinct set per doc)
  *  2. minhash signature computed the Spark-shaped way: explode shingles
  *     and take codegen'd partial-min aggregates — NOT per-row array
  *     lambdas (higher-order functions are interpreted; a fold of md5s
  *     inside `transform` serializes on one core and was ~40× slower).
  *     One md5 per shingle gives the 32-bit basis; a Carter–Wegman
  *     universal family (a_j·x + b_j mod 2^31−1) fans it into nHashes
  *     independent signature components with integer ops only.
  *  3. bands of r chunks hashed together → candidate buckets
  *  4. candidates = self-equi-join on (band, bucket) — the scale step:
  *     no all-pairs comparison, one shuffle on uniformly-distributed
  *     hashes
  *  5. verification = exact Jaccard over distinct shingle sets, computed
  *     only for docs that appear in a candidate pair (semi-join prune)
  *
  * At 100 TB: the explode→partial-min shape makes step 2 embarrassingly
  * parallel with map-side combine (the shuffle carries one signature row
  * per doc, not shingles). Mega-buckets from boilerplate text are the one
  * skew risk — handled by `candidatePairs`' bucket-width cap. The md5
  * basis is kept because it is reproducible in the DuckDB oracle; swap in
  * xxhash64 for cheaper hashing with the same plan shape.
  */
object MinHashDedup {

  /** Distinct k-char shingles of the first `maxChars` of `c` as an array
    * (verification-side representation; see `shingleRows` for the
    * signature-side one). Native codegen'd build
    * ([[graft.plans.DistinctShingles]]) — the composed
    * `array_distinct(transform(sequence...))` spelling it replaces runs
    * interpreted and was the dominant cost of candidate verification at
    * the 100× tier; DistinctShinglesSpec pins element/order equality. */
  def shingles(c: Column, k: Int = 9, maxChars: Int = 200): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.DistinctShingles(
      ColumnBridge.expression(substring(c, 1, maxChars)), k))
  }

  /** One row per (doc, shingle position) — NOT deduplicated: min over a
    * multiset equals min over its set, so signatures don't need distinct
    * shingles, and skipping the dedup keeps the whole phase inside
    * whole-stage codegen with no per-doc array materialization (the
    * array+`transform`+`array_distinct` form is interpreted and was the
    * dominant cost of the pipeline). */
  def shingleRows(docs: DataFrame, idCol: String, textNorm: Column,
                  k: Int = 9, maxChars: Int = 200): DataFrame =
    docs.select(col(idCol), substring(textNorm, 1, maxChars).as("__s"))
      .select(col(idCol), col("__s"),
        explode(sequence(lit(1), greatest(length(col("__s")) - (k - 1), lit(1)))).as("__i"))
      .select(col(idCol), col("__s").substr(col("__i"), lit(k)).as("__sh"))

  /** Carter–Wegman modulus for the signature hash family: the Mersenne
    * prime 2^31 − 1. Products a·x stay under 2^62, so the arithmetic is
    * exact in 64-bit integers on every engine — no overflow, no floats. */
  val P: Long = 2147483647L

  /** Deterministic (a_j, b_j) parameters for the universal hash family
    * h_j(x) = (a_j·x + b_j) mod P — a splitmix64 stream folded into
    * [1, P−1] × [0, P−1]. Fixed constants, not runtime randomness: the
    * same values are inlined as literals into both the Spark plan and the
    * DuckDB oracle twin, so signatures are reproducible cross-engine. */
  def hashParams(n: Int): IndexedSeq[(Long, Long)] = {
    var s = 0L
    def next(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    IndexedSeq.fill(n)((Math.floorMod(next(), P - 1) + 1, Math.floorMod(next(), P)))
  }

  /** One row per doc: (id, __sig) — the PACKED minhash signature, one
    * array<bigint> of nHashes BIGINT mins of a Carter–Wegman universal
    * family over a single md5-derived basis: x = uint32(first 8 md5 hex
    * chars) mod P, sig[j] = min over shingles of (a_j·x + b_j) mod P.
    * Computed by the native per-document expression
    * [[graft.plans.MinHashSignature]] — one codegen'd pass over each
    * doc's shingle set, value-identical to (and pinned against, in
    * MinHashSignatureSpec) the explode→md5-basis→min-aggregate spelling
    * it replaces. The signature phase is a pure projection: no exploded
    * (doc, shingle) rows, no nHashes-buffer hash aggregate, NO exchange
    * — at 100 TB the densest intermediate of the pipeline never becomes
    * shuffle files. The md5 basis (not xxhash64) is what keeps a
    * bit-exact DuckDB twin: `CAST('0x'||substr(md5(sh),1,8) AS BIGINT)`
    * decodes the identical value.
    *
    * This packed form is the one to JOIN on when a consumer needs whole
    * signatures per row (the q_lsh_precision estimate join ships one
    * array column per side instead of nHashes separate columns — r15);
    * [[signatures]] unpacks it when banding needs the slots. */
  def signaturesArr(docs: DataFrame, idCol: String, textNorm: Column,
                    k: Int = 9, maxChars: Int = 200, nHashes: Int = 16): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val sigArr = ColumnBridge.column(graft.plans.MinHashSignature(
      ColumnBridge.expression(substring(textNorm, 1, maxChars)), k, nHashes))
    docs.filter(textNorm.isNotNull)
      .select(col(idCol), sigArr.as("__sig"))
  }

  /** Unpack a [[signaturesArr]] frame to (id, mh0..mhN) slot columns —
    * a pure local projection (getItem per slot), so running it over an
    * eagerly-staged packed frame re-reads cached blocks, never the
    * shingle/md5 pipeline. */
  def unpackSignature(sigArr: DataFrame, idCol: String,
                      nHashes: Int = 16): DataFrame =
    sigArr.select(col(idCol) +: (0 until nHashes).map(j =>
      col("__sig").getItem(j).as(s"mh$j")): _*)

  /** One row per doc: (id, mh0..mhN) — [[signaturesArr]] unpacked to
    * slot columns (the banding surface).
    *
    * Two-step projection on purpose: `__sig` is materialized once and
    * the mh_j columns are `getItem`s over it — CollapseProject keeps the
    * split because the producing expression is non-cheap and referenced
    * nHashes times (MinHashSignatureSpec pins single evaluation). */
  def signatures(docs: DataFrame, idCol: String, textNorm: Column,
                 k: Int = 9, maxChars: Int = 200, nHashes: Int = 16): DataFrame =
    unpackSignature(signaturesArr(docs, idCol, textNorm, k, maxChars, nHashes),
      idCol, nHashes)

  /** Banded bucket rows (id, band, bucket) of a signature frame — the
    * join key surface of the LSH step, factored out so the persisted
    * index ([[MinHashIndex]]) stages exactly the rows the in-query
    * pipeline joins on.
    *
    * The bucket is a LONG — the first 15 hex chars (60 bits) of the
    * band's md5, not the 32-char hex string (r14): the banded frame is
    * the widest shuffle surface of the LSH step (bands× the corpus row
    * count, grouped once and self-joined once on (band, bucket)), and an
    * 8-byte key hashes/compares/ships ~4× cheaper than a 40-byte UTF8
    * string. A 60-bit prefix collision between DIFFERENT band values
    * (~n²/2^61 ≈ 10^-5 at the 100× tier's 4M buckets) could only ADD a
    * candidate pair, and every candidate is verified by exact Jaccard
    * downstream — and both engines take the same prefix, so the twins
    * agree exactly regardless. Cross-engine: DuckDB decodes the same 60
    * bits as `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`. */
  def banded(sig: DataFrame, idCol: String,
             nHashes: Int = 16, bands: Int = 4): DataFrame = {
    require(nHashes % bands == 0, "bands must divide nHashes")
    val r = nHashes / bands
    import org.apache.spark.sql.graftbridge.ColumnBridge
    sig.select(
      col(idCol),
      explode(array((0 until bands).map { b =>
        // "," separator: signature values are variable-width decimal
        // renderings now, so unseparated concatenation would be ambiguous.
        struct(lit(b).as("band"),
          ColumnBridge.column(graft.plans.Md5PrefixLong(ColumnBridge.expression(
            concat_ws(",", (0 until r).map(i => col(s"mh${b * r + i}")): _*)), 15))
            .as("bucket"))
      }: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** Candidate pairs via banding over a signature frame (id, mh0..mhN).
    * With r = nHashes/bands rows per band the s-curve midpoint sits at
    * ≈ (1/bands)^(1/r); the defaults (16, 4 → r=4) put it at ~0.71, so
    * sub-threshold background similarity is filtered in the banding step
    * instead of flooding the verifier with false candidates.
    *
    * `maxBucket` is the mega-bucket skew cap: buckets wider than it
    * (boilerplate text — thousands of near-identical docs hashing to one
    * bucket) would square inside a single reducer if self-joined. Instead
    * of dropping them (which would disconnect a genuine cluster wider
    * than the cap — ALL its buckets are over the cap, so no other band
    * rescues it), wide buckets degrade to star pairing: every member
    * pairs with the bucket's min-id representative. That keeps the
    * candidate count linear in bucket width while transitive clustering
    * (see `ConnectedComponents`) still connects the whole cluster through
    * the hub. Width and representative come from one map-side-combined
    * aggregation whose output is one row per DISTINCT bucket — broadcast
    * back onto the banded rows, so the wide/narrow split costs no sort
    * and no extra wide shuffle (a ranking window here would sort the
    * whole banded frame once per consumer). */
  def candidatePairs(sig: DataFrame, idCol: String,
                     nHashes: Int = 16, bands: Int = 4,
                     maxBucket: Int = 64): DataFrame = {
    val bandedRows = banded(sig, idCol, nHashes, bands)
    // Over-cap buckets only (rarities by construction): aggregated
    // map-side to one row per distinct bucket, then broadcast — the
    // narrow/wide split is an anti/equi broadcast join, costing the
    // banded frame no sort and no shuffle. Eagerly staged (r14): the
    // three broadcast consumers (anti-join, star join, and the star's
    // width fields) would each otherwise rebuild the full
    // banded-explode + exchange + aggregate — physical-plan audit at
    // the 100× tier showed the agg subtree planned THREE times with no
    // exchange reuse; the checkpoint is a handful of rows.
    val wide = bandedRows.groupBy("band", "bucket")
      .agg(count(lit(1)).as("__bw"), min(col(idCol)).as("__rep"))
      .filter(col("__bw") > maxBucket)
      .localCheckpoint(true)
    val narrow = bandedRows.join(broadcast(wide.select("band", "bucket")),
      Seq("band", "bucket"), "left_anti")
    val narrowPairs = narrow.as("x").join(narrow.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
    val starPairs = bandedRows
      .join(broadcast(wide), Seq("band", "bucket"))
      .filter(col(idCol) =!= col("__rep"))
      .select(col("__rep").as("id_a"), col(idCol).as("id_b"))
    narrowPairs.union(starPairs).distinct()
  }

  /** Exact Jaccard over distinct shingle arrays (verification step) —
    * a codegen'd single-pass hash-set expression
    * (`plans/JaccardSimilarity`), replacing the interpreted
    * `filter`/`array_contains` form that was O(|a|·|b|) per candidate
    * pair. Same value on distinct arrays, same DuckDB twin. */
  def jaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.JaccardSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Agreeing-slot count of two packed signatures (array<bigint>) — the
    * MinHash estimated-similarity statistic (agreement/nHashes estimates
    * Jaccard). Codegen'd single loop ([[graft.plans.ArrayAgreement]]);
    * the composed form is an nHashes-term chained CASE WHEN over nHashes
    * separate columns per join side. */
  def signatureAgreement(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.ArrayAgreement(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Full near-dup pipeline: pairs with Jaccard ≥ `threshold`.
    *
    * `sig` feeds a self-join and `pairs` feeds several consumers, so the
    * shingle/md5 work must not recompute per consumer (Catalyst does not
    * materialize common subplans across self-joins). `sig` is persisted
    * only for the duration of the candidate join: `pairs` — tiny, just id
    * pairs — is eagerly localCheckpoint'ed, after which `sig`'s cache is
    * released. Block lifetime contract: the id-pair blocks AND the
    * candidate-doc shingle-array blocks (r13; ~1.7 KB/candidate doc,
    * MEMORY_AND_DISK so they demote under pressure) stay pinned while
    * the returned frame is alive — the arrays cannot be released
    * earlier because the result is lazy and its verification joins read
    * them; rebuilding per consumer instead would pay the build 4×
    * (two size joins + two array joins). Same lifetime class as the
    * StagedOnce index family.
    *
    * Verification (the dominant phase at the 100× tier before r13)
    * applies the standard set-similarity pruning stack ahead of the
    * exact-Jaccard pass:
    *   - shingle arrays build ONCE per candidate doc (semi-join pruned,
    *     eagerly checkpointed) — previously each array-join consumer
    *     rebuilt them, doubling the interpreted-build cost;
    *   - LENGTH FILTER on exact distinct-set sizes: J(A,B) ≤
    *     min|A|,|B| / max|A|,|B|, so pairs with size ratio below the
    *     threshold die on a size-only join — they never ship their
    *     ~1.7 KB shingle arrays through the pair join and never reach
    *     the Jaccard pass. The bound is exact on sizes; the 1e-9 slack
    *     only ever KEEPS borderline pairs (the final jaccard filter is
    *     still the arbiter), so the prune cannot drop a passing pair. */
  def nearDuplicates(docs: DataFrame, idCol: String, textNorm: Column,
                     threshold: Double, k: Int = 9, maxChars: Int = 200,
                     nHashes: Int = 16, bands: Int = 4,
                     maxBucket: Int = 64): DataFrame = {
    val sig = signatures(docs, idCol, textNorm, k, maxChars, nHashes).persist()
    val pairs = candidatePairs(sig, idCol, nHashes, bands, maxBucket).localCheckpoint(true)
    sig.unpersist()
    // Verification runs per DISTINCT truncated text, not per pair (r14).
    // A replica-heavy corpus — THE near-dup use case — surfaces huge
    // candidate sets whose members are bitwise-identical texts: the 100×
    // tier yields 716k candidate pairs over 147k distinct truncated
    // texts among 500k candidate docs (3.4× array dedup; a pure-replica
    // corpus collapses by the full replication factor), so a per-pair
    // verify ships ~1.7 KB shingle arrays through two joins once per
    // PAIR to compute per-distinct-TEXT-pair Jaccard values. Instead:
    //   fp = 128-bit sha2-256 prefix of the truncated normalized text
    //   (equal text ⟹ equal shingle sequence ⟹ equal set size and
    //   equal Jaccard against any partner). sha256-derived — not md5 —
    //   because fp equality must BE text equality even adversarially:
    //   md5 chosen-prefix collisions are practical, and a collision
    //   here silently merges two distinct texts' representatives, i.e.
    //   wrong Jaccard and possible false-positive DELETION in a dedup
    //   pipeline. A 128-bit prefix keeps md5's key width on the
    //   verify stage's hottest join surface (fp rides five joins and a
    //   distinct) while forcing an attacker to a 2^64 birthday search
    //   with no known shortcut — vs md5's practical construction. The
    //   fp never crosses to the oracle (the twin verifies per pair),
    //   so the engine is free to pick its hash;
    //   shingle arrays are built ONCE per distinct fp (representative),
    //   the length prune joins fp-level sizes, exact Jaccard runs once
    //   per distinct (fp_a, fp_b), and the per-pair rows get their
    //   jaccard by an (fp_a, fp_b) join that AQE broadcasts when the
    //   distinct side is small. Worst case (all texts unique) the work
    //   matches the old per-pair shape plus one slim join; best case
    //   (replicas) the array traffic drops by the replication factor².
    // Shingle arrays are only materialized for candidate docs (semi-join
    // prune): the expensive array build never touches non-candidates.
    val ids = pairs.select(col("id_a").as(idCol))
      .union(pairs.select(col("id_b").as(idCol))).distinct()
    val cand = docs.join(ids, Seq(idCol), "left_semi")
      .select(col(idCol), substring(textNorm, 1, maxChars).as("__t"))
      .withColumn("__fp", substring(sha2(col("__t"), 256), 1, 32))
    // Slim (id → fp) map and per-fp representative arrays are the two
    // staged frames (same lifetime contract as the r13 shArr checkpoint:
    // pinned while the returned lazy frame is alive).
    val docFp = cand.select(col(idCol), col("__fp")).localCheckpoint(true)
    val repArr = cand.dropDuplicates("__fp")
      .select(col("__fp"), shingles(col("__t"), k, maxChars).as("__sh"))
      .withColumn("__n", size(col("__sh")))
      .localCheckpoint(true)
    val fpPairs = pairs
      .join(docFp.toDF("id_a", "fp_a"), "id_a")
      .join(docFp.toDF("id_b", "fp_b"), "id_b")
    val sizes = repArr.select(col("__fp"), col("__n"))
    val pruned = fpPairs
      .join(sizes.toDF("fp_a", "n_a"), "fp_a")
      .join(sizes.toDF("fp_b", "n_b"), "fp_b")
      .filter(least(col("n_a"), col("n_b")).cast("double") >=
        (lit(threshold) - lit(1e-9)) * greatest(col("n_a"), col("n_b")))
      .select("id_a", "id_b", "fp_a", "fp_b")
    val jac = pruned.select("fp_a", "fp_b").distinct()
      .join(repArr.select(col("__fp").as("fp_a"), col("__sh").as("sh_a")), "fp_a")
      .join(repArr.select(col("__fp").as("fp_b"), col("__sh").as("sh_b")), "fp_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("fp_a", "fp_b", "jaccard")
    pruned.join(jac, Seq("fp_a", "fp_b"))
      .select("id_a", "id_b", "jaccard")
  }
}
