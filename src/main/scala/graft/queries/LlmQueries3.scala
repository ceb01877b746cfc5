package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns._

/** Third batch of LLM-training-data pipeline operators: PII redaction,
  * Gopher-style quality gates, cross-corpus line dedup, benchmark
  * decontamination, and character-distribution concentration.
  *
  * All five are single-pass relational shapes — explode → map-side
  * partial aggregation, or pure projections — with no UDFs, no
  * collect_list order dependence, and no floating-point accumulation
  * (every double in an output column is a single scalar op over exact
  * integers, which is bitwise reproducible cross-engine).
  */
object LlmQueries3 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** The testdata corpus carries no PII, so the query plants it
    * deterministically from doc_id (same expression in the oracle):
    * every 3rd doc gains an email, every 5th a URL, every 7th a phone
    * number. What's tested is the redaction chain, not the fixture. */
  private def plantedPii(text: org.apache.spark.sql.Column,
                         id: org.apache.spark.sql.Column) = {
    val idStr = id.cast("string")
    concat(
      when(id % 3 === 0,
        concat(text, lit(" contact user"), idStr, lit("@example.com now")))
        .otherwise(text),
      when(id % 5 === 0,
        concat(lit(" visit https://site"), idStr, lit(".example.org/p?id="), idStr))
        .otherwise(lit("")),
      when(id % 7 === 0,
        concat(lit(" call 555-123-"), lpad(idStr, 4, "0")))
        .otherwise(lit("")))
  }

  /** PII scrub over the corpus: per doc, how many of each PII class were
    * found (counted pre-redaction) and the md5 of the scrubbed text —
    * narrow output, full-fidelity check that both engines redacted
    * byte-identically. Pure projection: zero shuffles until the sort. */
  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val aug = plantedPii(col("text"), col("doc_id"))
    docs.select(
        col("doc_id"),
        regexp_count(aug, lit(EmailPattern)).as("n_emails"),
        regexp_count(aug, lit(UrlPattern)).as("n_urls"),
        regexp_count(aug, lit(PhonePattern)).as("n_phones"),
        length(redactPii(aug)).as("red_len"),
        md5(redactPii(aug)).as("red_md5"))
      .orderBy("doc_id")
  }

  val piiRedactSql: String = """
WITH aug AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 3 = 0
               THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
               ELSE text END)
         || (CASE WHEN doc_id % 5 = 0
                  THEN ' visit https://site' || CAST(doc_id AS VARCHAR) || '.example.org/p?id=' || CAST(doc_id AS VARCHAR)
                  ELSE '' END)
         || (CASE WHEN doc_id % 7 = 0
                  THEN ' call 555-123-' || lpad(CAST(doc_id AS VARCHAR), 4, '0')
                  ELSE '' END) AS a
  FROM documents),
red AS (
  SELECT doc_id, a,
         regexp_replace(
           regexp_replace(
             regexp_replace(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             'https?://[^\s]+', '<URL>', 'g'),
           '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS r
  FROM aug)
SELECT doc_id,
       len(regexp_extract_all(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
       len(regexp_extract_all(a, 'https?://[^\s]+')) AS n_urls,
       len(regexp_extract_all(a, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phones,
       length(r) AS red_len,
       md5(r) AS red_md5
FROM red ORDER BY doc_id
"""

  /** Gopher-style quality gate (Rae et al. 2021, table A1 shape): word
    * count, mean word length, distinct-word ratio, and stopword evidence
    * per doc, plus the combined keep/drop flag. One explode → groupBy
    * with map-side combine; the scalar signals ride along via exact
    * integer sums, each ratio is a single IEEE division. */
  def gopherFilters(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tok = docs.select(col("doc_id"),
      explode(tokens(normalizeText(col("text")))).as("tk"))
    val st = tok.groupBy("doc_id").agg(
      count(lit(1)).as("n_words"),
      countDistinct(col("tk")).as("n_distinct"),
      sum(length(col("tk"))).as("sum_len"))
    docs.select(col("doc_id"),
        stopwordScore(col("text"), StopwordPatterns.toMap.apply("en")).as("sw_hits"))
      .join(st, Seq("doc_id"))
      .select(
        col("doc_id"), col("n_words"),
        (col("sum_len").cast("double") / col("n_words").cast("double")).as("mean_word_len"),
        (col("n_distinct").cast("double") / col("n_words").cast("double")).as("distinct_ratio"),
        col("sw_hits"),
        (col("n_words").between(20, 100000) &&
          (col("sum_len") * 10 >= col("n_words") * 30) &&
          (col("sum_len") * 10 <= col("n_words") * 100) &&
          (col("n_distinct") * 10 > col("n_words") * 3) &&
          col("sw_hits") >= 2).as("keep"))
      .orderBy("doc_id")
  }

  val gopherFiltersSql: String = """
WITH norm AS (
  SELECT doc_id, text, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
  FROM documents),
tok AS (
  SELECT doc_id, unnest(string_split(s, ' ')) AS tk FROM norm WHERE length(s) > 0),
st AS (
  SELECT doc_id, COUNT(*) AS n_words, COUNT(DISTINCT tk) AS n_distinct,
         SUM(length(tk)) AS sum_len
  FROM tok GROUP BY doc_id),
sw AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for|it|was)\b')) AS sw_hits
  FROM norm)
SELECT st.doc_id, st.n_words,
       CAST(st.sum_len AS DOUBLE) / CAST(st.n_words AS DOUBLE) AS mean_word_len,
       CAST(st.n_distinct AS DOUBLE) / CAST(st.n_words AS DOUBLE) AS distinct_ratio,
       sw.sw_hits,
       (st.n_words BETWEEN 20 AND 100000
        AND st.sum_len * 10 >= st.n_words * 30
        AND st.sum_len * 10 <= st.n_words * 100
        AND st.n_distinct * 10 > st.n_words * 3
        AND sw.sw_hits >= 2) AS keep
FROM st JOIN sw ON st.doc_id = sw.doc_id
ORDER BY st.doc_id
"""

  /** Cross-corpus line dedup (CCNet-style, adapted to the newline-free
    * corpus: a "line" is a 3-token window at stride 3). Lines whose hash
    * appears in more than `maxDocs` distinct docs are boilerplate and
    * dropped; the per-doc removal ratio is the quality signal. The line
    * frequency table aggregates map-side on the hash — the only wide
    * exchange is keyed by a uniform md5, and the doc-side join is a
    * broadcast at any realistic boilerplate-table size. */
  def lineDedup(s: SparkSession, dir: String): DataFrame = {
    val maxDocs = 2
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), posexplode(tokens(normalizeText(col("text")))).as(Seq("pos", "tk")))
    val lines = tok
      .withColumn("t2", lead(col("tk"), 2).over(w))
      .withColumn("line", concat_ws(" ", col("tk"), lead(col("tk"), 1).over(w), col("t2")))
      .filter(col("t2").isNotNull && col("pos") % 3 === 0)
      .select(col("doc_id"), md5(col("line")).as("lh"))
    val freq = lines.groupBy("lh")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") > maxDocs)
    lines.join(broadcast(freq), Seq("lh"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        count(col("n_docs")).as("n_removed"))
      .withColumn("removed_ratio",
        col("n_removed").cast("double") / col("n_lines").cast("double"))
      .orderBy("doc_id")
  }

  val lineDedupSql: String = """
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
  FROM documents),
tok AS (
  SELECT doc_id, u.i - 1 AS pos, u.tk FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ts) + 1),
                                 i -> struct_pack(i := i, tk := ts[i]))) AS u
    FROM (SELECT doc_id, string_split(s, ' ') AS ts FROM norm WHERE length(s) > 0) x) y),
ln AS (
  SELECT doc_id, pos,
         concat_ws(' ', tk,
                   lead(tk, 1) OVER (PARTITION BY doc_id ORDER BY pos),
                   lead(tk, 2) OVER (PARTITION BY doc_id ORDER BY pos)) AS line,
         lead(tk, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
  FROM tok),
lines AS (
  SELECT doc_id, md5(line) AS lh FROM ln WHERE t2 IS NOT NULL AND pos % 3 = 0),
freq AS (
  SELECT lh, COUNT(DISTINCT doc_id) AS n_docs FROM lines GROUP BY lh
  HAVING COUNT(DISTINCT doc_id) > 2)
SELECT l.doc_id, COUNT(*) AS n_lines, COUNT(f.n_docs) AS n_removed,
       CAST(COUNT(f.n_docs) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS removed_ratio
FROM lines l LEFT JOIN freq f ON l.lh = f.lh
GROUP BY l.doc_id ORDER BY l.doc_id
"""

  /** Benchmark decontamination (the n-gram-overlap check run before
    * training, cf. GPT-3 appendix C / PaLM sec. 8): the holdout is the
    * deterministic slice doc_id % 97 = 0; a training doc is contaminated
    * when it shares ≥ 3 distinct token 3-grams with any holdout doc.
    * The holdout gram set is tiny by construction → broadcast join; the
    * training side streams through in one pass. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), posexplode(tokens(normalizeText(col("text")))).as(Seq("pos", "tk")))
    val grams = tok
      .withColumn("t2", lead(col("tk"), 2).over(w))
      .withColumn("ng", md5(concat_ws(" ", col("tk"), lead(col("tk"), 1).over(w), col("t2"))))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), col("ng"))
    val bench = grams.filter(col("doc_id") % 97 === 0)
      .select(col("ng")).distinct()
    val train = grams.filter(col("doc_id") % 97 =!= 0)
    train.join(broadcast(bench), Seq("ng"), "left_semi")
      .groupBy("doc_id").agg(countDistinct(col("ng")).as("n_overlap"))
      .join(train.select("doc_id").distinct(), Seq("doc_id"), "right_outer")
      .select(col("doc_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) >= 3).as("contaminated"))
      .orderBy("doc_id")
  }

  val decontaminateSql: String = """
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
  FROM documents),
tok AS (
  SELECT doc_id, u.i - 1 AS pos, u.tk FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ts) + 1),
                                 i -> struct_pack(i := i, tk := ts[i]))) AS u
    FROM (SELECT doc_id, string_split(s, ' ') AS ts FROM norm WHERE length(s) > 0) x) y),
g AS (
  SELECT doc_id,
         md5(concat_ws(' ', tk,
                       lead(tk, 1) OVER (PARTITION BY doc_id ORDER BY pos),
                       lead(tk, 2) OVER (PARTITION BY doc_id ORDER BY pos))) AS ng,
         lead(tk, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
  FROM tok),
grams AS (SELECT doc_id, ng FROM g WHERE t2 IS NOT NULL),
bench AS (SELECT DISTINCT ng FROM grams WHERE doc_id % 97 = 0),
train AS (SELECT doc_id, ng FROM grams WHERE doc_id % 97 <> 0),
ov AS (
  SELECT doc_id, COUNT(DISTINCT ng) AS n_overlap
  FROM train WHERE ng IN (SELECT ng FROM bench)
  GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(ov.n_overlap, 0) AS n_overlap,
       COALESCE(ov.n_overlap, 0) >= 3 AS contaminated
FROM (SELECT DISTINCT doc_id FROM train) d
LEFT JOIN ov ON d.doc_id = ov.doc_id
ORDER BY d.doc_id
"""

  /** Character-distribution concentration per doc: distinct characters
    * and Gini impurity (1 − Σ pᵢ²) over non-space characters — the
    * log-free twin of character entropy (a Σ p·ln p across engines hinges
    * on libm ulp agreement; Σ c² over exact longs does not). Low gini =
    * degenerate character soup, a standard junk-text signal. */
  def charGini(s: SparkSession, dir: String): DataFrame = {
    val ch = t(s, dir, "documents")
      .select(col("doc_id"), regexp_replace(col("text"), " ", "").as("cs"))
      .select(col("doc_id"), col("cs"),
        explode(sequence(lit(1), greatest(length(col("cs")), lit(1)))).as("i"))
      .select(col("doc_id"), col("cs").substr(col("i"), lit(1)).as("c"))
      .filter(length(col("c")) > 0)
    ch.groupBy("doc_id", "c").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_distinct_chars"),
        sum(col("n")).as("n_chars"),
        sum(col("n") * col("n")).as("ssq"))
      .select(col("doc_id"), col("n_chars"), col("n_distinct_chars"),
        (lit(1.0) - col("ssq").cast("double") /
          (col("n_chars") * col("n_chars")).cast("double")).as("gini"))
      .orderBy("doc_id")
  }

  val charGiniSql: String = """
WITH cs AS (
  SELECT doc_id, replace(text, ' ', '') AS cs FROM documents),
ch AS (
  SELECT doc_id, substr(cs, CAST(i AS INTEGER), 1) AS c
  FROM cs, unnest(range(1, greatest(length(cs), 1) + 1)) t(i)
  WHERE length(substr(cs, CAST(i AS INTEGER), 1)) > 0),
cc AS (SELECT doc_id, c, COUNT(*) AS n FROM ch GROUP BY doc_id, c)
SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_chars, COUNT(*) AS n_distinct_chars,
       1.0 - CAST(SUM(n * n) AS DOUBLE) / CAST(SUM(n) * SUM(n) AS DOUBLE) AS gini
FROM cc GROUP BY doc_id ORDER BY doc_id
"""

  /** Real media-header triage: valid PNG / BMP / JPEG headers are
    * synthesized in-engine (dimensions a closed-form function of doc_id,
    * bytes built with hex/unhex — no driver loop), then parsed back by
    * `Multimodal.parseDims`' actual byte-offset/marker-walk logic in a
    * partition-parallel pass. The oracle knows only the arithmetic — so
    * a parse that didn't truly invert the binary encoding fails the
    * hash compare. */
  def mediaDims(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaRow
    val w = (lit(16L) + col("doc_id") % 1920).cast("long")
    val h = (lit(16L) + (col("doc_id") * 7) % 1080).cast("long")
    def beHex(c: org.apache.spark.sql.Column, n: Int) = lpad(hex(c), n, "0")
    def leHex(c: org.apache.spark.sql.Column) = {
      val b = beHex(c, 8)
      concat(substring(b, 7, 2), substring(b, 5, 2), substring(b, 3, 2), substring(b, 1, 2))
    }
    val pngHex = concat(lit("89504E470D0A1A0A0000000D49484452"), beHex(w, 8), beHex(h, 8))
    val bmpHex = concat(lit("424D" + "00" * 16), leHex(w), leHex(h))
    val jpgHex = concat(lit("FFD8FFC0001108"), beHex(h, 4), beHex(w, 4), lit("00"))
    val payload = unhex(
      when(col("doc_id") % 3 === 0, pngHex)
        .when(col("doc_id") % 3 === 1, bmpHex)
        .otherwise(jpgHex))
    val media = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"), lit("m").as("group"),
        payload.as("payload"))
      .as[MediaRow]
    Multimodal.headerDims(media)
      .select(col("id").as("doc_id"), col("format"), col("width"), col("height"))
      .orderBy("doc_id")
  }

  val mediaDimsSql: String = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'jpeg' END AS format,
       16 + doc_id % 1920 AS width,
       16 + (doc_id * 7) % 1080 AS height
FROM documents ORDER BY doc_id
"""

  /** REAL image decode round trip — `javax.imageio` (JDK-built-in
    * codecs, no external library) both ways: a deterministic 8-bit gray
    * PNG is encoded per doc executor-side (dimensions and every pixel a
    * closed-form function of doc_id), then `Multimodal.decodeImage`
    * decodes it back partition-parallel and emits true decoded
    * dimensions plus the exact band-0 pixel sum. PNG is lossless, so the
    * oracle needs only the arithmetic — a decode that didn't truly
    * recover the pixels misses the hash. JPEG is excluded from the
    * pixel-sum check by design (lossy codec, decoder-dependent values);
    * its header triage is covered by q_media_dims. */
  def mediaDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaRow
    val ids = t(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id").cast("long")).as[Long]
    val media = ids.mapPartitions(_.map { id =>
      val w = (1 + id % 8).toInt
      val h = (1 + (id * 3) % 8).toInt
      MediaRow(id, "img", Multimodal.encodeGrayPng(w, h,
        (x, y) => ((id * 31 + 7 * x + 13 * y) % 256).toInt))
    })
    Multimodal.decodeImage(media)
      .select(col("id").as("doc_id"), col("format"),
        col("width"), col("height"), col("pix_sum"))
      .orderBy("doc_id")
  }

  val mediaDecodeSql: String = """
WITH d AS (
  SELECT doc_id, 1 + doc_id % 8 AS w, 1 + (doc_id * 3) % 8 AS h
  FROM documents WHERE doc_id < 200)
SELECT d.doc_id, 'png' AS format,
       CAST(d.w AS BIGINT) AS width, CAST(d.h AS BIGINT) AS height,
       CAST(SUM((d.doc_id * 31 + 7 * g1.x + 13 * g2.y) % 256) AS BIGINT) AS pix_sum
FROM d, unnest(range(0, d.w)) g1(x), unnest(range(0, d.h)) g2(y)
GROUP BY d.doc_id, d.w, d.h
ORDER BY d.doc_id
"""

  /** Deterministic mixture sampling — the data-mixing step of training
    * prep: a 200-doc budget allocated across sources proportionally to
    * each source's share of the corpus (largest-remainder rounding on
    * exact integer arithmetic), each source's quota filled by md5 rank
    * (the same seedless draw as q_stratified_sample). Largest-remainder
    * rounding on exact integers: floor quotas first, then the leftover
    * budget goes one doc at a time to the sources with the largest
    * remainders (source name breaks remainder ties). Scale discipline
    * (r7): scalar totals are broadcast singleton rows, the remainder
    * rank runs through the range-partitioned PrefixSum, and the
    * quota-fill rank pre-prunes with the bounded-heap TopKPerGroup
    * (every quota ≤ budget) so the per-stratum window sorts at most
    * budget·sources survivors instead of the whole corpus — the
    * q_stratified_sample fix applied to the mixture draw. */
  def mixtureSample(s: SparkSession, dir: String): DataFrame = {
    val budget = 200L
    val docs = t(s, dir, "documents")
    // Per-source counts staged once (lazy checkpoint): the corpus total
    // folds out of the same blocks (Σ n_docs) instead of a separate
    // full-table count, and the leftover scalar and PrefixSum rank read
    // the blocks too — ONE corpus scan for the whole allocation (r8 fix).
    val srcCounts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .localCheckpoint(false)
    // coalesce + max(_,1): an empty corpus must yield an empty result,
    // not an NPE on the null sum / a 0-divisor literal.
    val tot = math.max(
      srcCounts.agg(coalesce(sum("n_docs"), lit(0L))).head().getLong(0), 1L)
    val alloc0 = srcCounts
      .withColumn("fq", expr(s"(n_docs * $budget) DIV $tot"))
      .withColumn("rem", expr(s"(n_docs * $budget) % $tot"))
    val leftover = alloc0.agg((lit(budget) - sum(col("fq"))).as("leftover"))
    val alloc = graft.operators.PrefixSum
      .rank(alloc0, -col("rem"), Seq(col("rem").desc, col("source")), "rn",
        preStaged = true,
        // rem ∈ [0, tot) and is pseudo-uniform (a mod-tot residue) —
        // literal grid cuts, no stats job
        keyRange = Some((-tot.toDouble, 0d)))
      .crossJoin(broadcast(leftover))
      .withColumn("quota",
        col("fq") + when(col("rn") <= col("leftover"), 1L).otherwise(0L))
    val w = Window.partitionBy("source").orderBy("__ord")
    val picked = graft.plans.TopKPerGroup.topK(
      docs.select(col("doc_id"), col("source"))
        .withColumn("__ord",
          md5(concat(lit("mix|"), col("doc_id").cast("string")))),
      Seq(col("source")), Seq(col("__ord")), k = budget.toInt)
    picked.withColumn("rk", row_number().over(w))
      .join(broadcast(alloc.select("source", "quota")), "source")
      .filter(col("rk") <= col("quota"))
      .select(col("source"), col("doc_id"), col("rk"), col("quota"))
      .orderBy("source", "rk")
  }

  val mixtureSampleSql: String = """
WITH alloc0 AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(COUNT(*) * 200 // (SELECT COUNT(*) FROM documents) AS BIGINT) AS fq,
         CAST(COUNT(*) * 200 % (SELECT COUNT(*) FROM documents) AS BIGINT) AS rem
  FROM documents GROUP BY source),
alloc AS (
  SELECT source,
         fq + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                        <= 200 - (SELECT SUM(fq) FROM alloc0)
                   THEN 1 ELSE 0 END AS quota
  FROM alloc0),
ranked AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5('mix|' || CAST(doc_id AS VARCHAR))) AS rk
  FROM documents)
SELECT r.source, r.doc_id, r.rk, a.quota
FROM ranked r JOIN alloc a ON r.source = a.source
WHERE r.rk <= a.quota
ORDER BY r.source, r.rk
"""

  /** Token-budget report — the pipeline summary a data lead reads: per
    * source, docs and (BPE-ish) tokens before and after hygiene (exact
    * dedup keep-first ∧ Gopher keep gate). Composes fingerprint dedup,
    * the quality gate, and token counting in ONE aggregation over one
    * scan-shaped frame — the signals ride along as columns; no second
    * pass over the corpus. */
  def tokenBudget(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val w = Window.partitionBy("fp")
      .orderBy("doc_id")
    val sig = docs.select(
        col("source"), col("doc_id"),
        bpeTokenCount(col("text")).cast("long").as("toks"),
        fingerprint(col("text")).as("fp"),
        tokenCount(normalizeText(col("text"))).as("nw"),
        stopwordScore(col("text"), StopwordPatterns.toMap.apply("en")).as("sw"))
      .withColumn("canonical", row_number().over(w) === 1)
      .withColumn("keep",
        col("canonical") && col("nw").between(20, 100000) && col("sw") >= 2)
    sig.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_docs_kept"),
        sum(when(col("keep"), col("toks")).otherwise(0L)).as("n_tokens_kept"))
      .orderBy("source")
  }

  val tokenBudgetSql: String = """
WITH sig AS (
  SELECT source, doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS toks,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
         CASE WHEN length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) = 0 THEN 0
              ELSE len(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) END AS nw,
         len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for|it|was)\b')) AS sw
  FROM documents),
k AS (
  SELECT source, toks,
         (row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
          AND nw BETWEEN 20 AND 100000 AND sw >= 2) AS keep
  FROM sig)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
       CAST(SUM(CASE WHEN keep THEN toks ELSE 0 END) AS BIGINT) AS n_tokens_kept
FROM k GROUP BY source ORDER BY source
"""

  /** Inverted-index build: per term, document frequency plus a BOUNDED
    * posting list (the 10 smallest doc ids, comma-joined). The bound is
    * the scale decision: full postings for a stopword are the corpus
    * itself, so the hot-term state must be capped BEFORE the per-term
    * collect — here by the native `TopKPerGroup` operator (two-phase
    * bounded heaps: k rows per term cross the wire, never a stopword's
    * full posting set). df stays exact via a separate map-side-combined
    * count. Postings serialize as a string at the output edge (driver
    * compare hashes cells; arrays aren't hashable there). */
  def invertedIndex(s: SparkSession, dir: String): DataFrame = {
    val posting = t(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(normalizeText(col("text")))).as("term"))
      .distinct()
      .localCheckpoint(true) // feeds df count + top-k (self-reuse, no recompute)
    val dfreq = posting.groupBy("term").agg(count(lit(1)).as("df"))
    val capped = graft.plans.TopKPerGroup.topK(posting,
      Seq(col("term")), Seq(col("doc_id")), k = 10)
    val lists = capped.groupBy("term").agg(
      array_join(transform(array_sort(collect_list(col("doc_id"))),
        _.cast("string")), ",").as("postings"))
    dfreq.join(lists, "term").orderBy("term")
  }

  val invertedIndexSql: String = """
WITH p AS (
  SELECT DISTINCT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS term
  FROM documents),
p2 AS (SELECT * FROM p WHERE term <> ''),
d AS (SELECT term, COUNT(*) AS df FROM p2 GROUP BY term),
r AS (SELECT term, doc_id,
             row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM p2),
l AS (SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
      FROM r WHERE rn <= 10 GROUP BY term)
SELECT term, df, postings FROM d JOIN l USING (term) ORDER BY term
"""

  /** Term co-occurrence scored by the PMI ratio — which term pairs
    * appear in the same document more than independence predicts.
    * Exactly the monotone core of PMI, without its logarithm: ln is a
    * libm call whose last ulp differs across engines, while
    * c_ab·N / (c_a·c_b) is one division of exact integers — bitwise
    * reproducible, same ranking. The scale levers: the pair space is
    * restricted to a bounded top-df vocabulary (broadcast semi-join —
    * co-occurrence over an unpruned vocab is quadratic in per-doc
    * DISTINCT terms), and support < 5 pairs are cut before ranking. */
  def pmiPairs(s: SparkSession, dir: String): DataFrame = {
    val dt = t(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(normalizeText(col("text")))).as("term"))
      .distinct()
      .localCheckpoint(true) // feeds vocab, unigram counts, and both join sides
    val vocab = dt.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(200)
    val pruned = dt.join(broadcast(vocab.select("term")), Seq("term"), "left_semi")
    val uni = pruned.groupBy("term").agg(count(lit(1)).as("c"))
    val pairs = pruned.as("x").join(pruned.as("y"),
        col("x.doc_id") === col("y.doc_id") && col("x.term") < col("y.term"))
      .groupBy(col("x.term").as("term_a"), col("y.term").as("term_b"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
    val nDocs = t(s, dir, "documents").count()
    pairs
      .join(broadcast(uni.select(col("term").as("term_a"), col("c").as("c_a"))), "term_a")
      .join(broadcast(uni.select(col("term").as("term_b"), col("c").as("c_b"))), "term_b")
      .select(col("term_a"), col("term_b"), col("c_ab"),
        ((col("c_ab") * nDocs).cast("double") / (col("c_a") * col("c_b"))).as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("term_a"), col("term_b"))
      .limit(50)
  }

  val pmiPairsSql: String = """
WITH dt AS (
  SELECT DISTINCT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS term
  FROM documents),
dt2 AS (SELECT * FROM dt WHERE term <> ''),
vocab AS (SELECT term FROM (SELECT term, COUNT(*) AS cnt FROM dt2 GROUP BY term
                            ORDER BY cnt DESC, term LIMIT 200)),
pr AS (SELECT dt2.* FROM dt2 SEMI JOIN vocab USING (term)),
uni AS (SELECT term, COUNT(*) AS c FROM pr GROUP BY term),
pairs AS (
  SELECT x.term AS term_a, y.term AS term_b, COUNT(*) AS c_ab
  FROM pr x JOIN pr y ON x.doc_id = y.doc_id AND x.term < y.term
  GROUP BY x.term, y.term HAVING COUNT(*) >= 5),
n AS (SELECT COUNT(*) AS nd FROM documents)
SELECT term_a, term_b, c_ab,
       CAST(c_ab * nd AS DOUBLE) / (a.c * b.c) AS pmi_ratio
FROM pairs JOIN uni a ON a.term = term_a JOIN uni b ON b.term = term_b
CROSS JOIN n
ORDER BY pmi_ratio DESC, term_a, term_b
LIMIT 50
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pmi_pairs" -> (pmiPairs _),
    "q_inverted_index" -> (invertedIndex _),
    "q_mixture_sample" -> (mixtureSample _),
    "q_token_budget" -> (tokenBudget _),
    "q_pii_redact" -> (piiRedact _),
    "q_gopher_filters" -> (gopherFilters _),
    "q_line_dedup" -> (lineDedup _),
    "q_decontaminate" -> (decontaminate _),
    "q_char_gini" -> (charGini _),
    "q_media_dims" -> (mediaDims _),
    "q_media_decode" -> (mediaDecode _))

  val oracles: Map[String, String] = Map(
    "q_pmi_pairs" -> pmiPairsSql,
    "q_inverted_index" -> invertedIndexSql,
    "q_mixture_sample" -> mixtureSampleSql,
    "q_token_budget" -> tokenBudgetSql,
    "q_pii_redact" -> piiRedactSql,
    "q_gopher_filters" -> gopherFiltersSql,
    "q_line_dedup" -> lineDedupSql,
    "q_decontaminate" -> decontaminateSql,
    "q_char_gini" -> charGiniSql,
    "q_media_dims" -> mediaDimsSql,
    "q_media_decode" -> mediaDecodeSql)
}
