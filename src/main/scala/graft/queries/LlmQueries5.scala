package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns.{normalizeText, tokens}

/** Fifth LLM-pipeline batch: cross-document substring-level dedup.
  */
object LlmQueries5 {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Substring-level cross-document dedup — the rolling-window
    * restatement of ExactSubstr (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): suffix arrays find
    * repeated substrings exactly but don't distribute; fixed-width
    * 8-token rolling windows (shingles) find the same cross-document
    * repetition with an embarrassingly parallel plan. Distinct from
    * q_dup_ngram_ratio (WITHIN-doc repetition) and q_line_dedup
    * (line-granularity boilerplate): this catches verbatim passages
    * copied ACROSS documents at arbitrary offsets.
    *
    * Positives are planted (house pattern — the corpus carries none):
    * every 10th doc gets a partial copy (its first 12 normalized
    * tokens) appended as a new doc, so 5 windows per planted pair are
    * genuinely shared and every count below is load-bearing.
    *
    * Scale shape: window keys are md5 digests (fixed 32-byte shuffle
    * keys, not unbounded 8-token strings); "appears in ≥2 docs" is
    * `min(doc_id) <> max(doc_id)` — one map-side-combinable agg, no
    * count-distinct expansion; the dup-key set joins back by digest
    * equi-join. Explode fan-out ≈ tokens per doc, the same bound as
    * q_line_dedup. No sort, no window function, no driver loop. */
  def substrDedup(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"),
        tokens(normalizeText(col("text"))).as("toks"))
    val planted = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        slice(col("toks"), 1, 12).as("toks"))
    val wins = base.union(planted)
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("toks")) - 8),
          i => md5(array_join(slice(col("toks"), i + 1, lit(8)), " ")))).as("wkey"))
    val dup = wins.groupBy("wkey")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select(col("wkey"), lit(1L).as("dup"))
    wins.join(dup, Seq("wkey"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_win"),
        sum(coalesce(col("dup"), lit(0L))).as("n_dup"))
      .select(col("doc_id"), col("n_win"), col("n_dup"),
        expr("n_dup * 10000 DIV n_win").as("dup_bp"))
      .withColumn("keep", col("dup_bp") < 5000)
      .orderBy("doc_id")
  }

  val substrDedupSql: String = """
WITH base AS (
  SELECT doc_id,
         CASE WHEN length(s) > 0 THEN string_split(s, ' ') ELSE [] END AS toks
  FROM (SELECT doc_id,
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
        FROM documents)),
corpus AS (
  SELECT doc_id, toks FROM base
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, toks[1:12] AS toks
  FROM base WHERE doc_id % 10 = 0),
wins AS (
  SELECT doc_id, md5(array_to_string(toks[g.i:g.i+7], ' ')) AS wkey
  FROM corpus, unnest(range(1, len(toks) - 6)) g(i)
  WHERE len(toks) >= 8),
dup AS (
  SELECT wkey FROM wins GROUP BY wkey
  HAVING min(doc_id) <> max(doc_id)),
per_doc AS (
  SELECT w.doc_id, COUNT(*) AS n_win, COUNT(d.wkey) AS n_dup
  FROM wins w LEFT JOIN dup d USING (wkey)
  GROUP BY w.doc_id)
SELECT doc_id, n_win, n_dup, n_dup * 10000 // n_win AS dup_bp,
       (n_dup * 10000 // n_win) < 5000 AS keep
FROM per_doc ORDER BY doc_id
"""

  /** Prefix-filtered set-similarity join (Chaudhuri et al. SSJoin
    * ICDE'06 / Bayardo et al. WWW'07) — the EXACT blocking alternative
    * to MinHash: order every token set by global rarity, and any pair
    * with Jaccard ≥ t must share a token within each set's first
    * |s| − ⌈t·|s|⌉ + 1 tokens, so candidate generation is an equi-join
    * on prefix tokens (rarest tokens → smallest blocks) plus the
    * length filter 5·min ≥ 4·max, with zero false negatives. The
    * oracle is therefore a brute-force all-pairs scan over the bounded
    * slice — if the prefix blocking dropped ANY qualifying pair, the
    * row sets differ and the hash catches it (the blocking is the
    * claim under test, not just the arithmetic).
    *
    * Exactness: Jaccard compared as integers (inter·5 ≥ union·4);
    * reported as basis points via integer division. Positives planted
    * as 2-token-poorer copies of every 7th doc (J = (n−2)/n ≥ 0.8 for
    * n ≥ 10). Scale shape: frequency ranking is one combinable agg +
    * an equi-join; per-doc ordered sets re-assemble via a bounded
    * collect (set-sized); candidates are equi-join blocks, never an
    * all-pairs product. */
  def setsimJoin(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").filter(col("doc_id") < 150)
      .select(col("doc_id").cast("long").as("doc_id"),
        array_sort(array_distinct(tokens(normalizeText(col("text"))))).as("set"))
      .withColumn("sz", size(col("set")).cast("long"))
      .filter(col("sz") > 0)
    val planted = base.filter(col("doc_id") % 7 === 0 && col("sz") >= 10)
      .select((col("doc_id") + 10000).as("doc_id"),
        slice(col("set"), lit(1), (col("sz") - 2).cast("int")).as("set"),
        (col("sz") - 2).as("sz"))
    val sets = base.unionByName(planted)
    val tok = sets.select(col("doc_id"), explode(col("set")).as("tok"))
    val freq = tok.groupBy("tok").agg(count(lit(1)).as("f"))
    val ordered = tok.join(freq, "tok")
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("f"), col("tok")))),
        x => x.getField("tok")).as("ord"))
    // prefix length |s| - ceil(0.8|s|) + 1; ceil(4n/5) = (4n+4) DIV 5
    // Materialized ONCE before the self-join: without this the whole
    // tokenize -> freq -> rarity-order pipeline plans twice (plan audit
    // showed zero ReusedExchange across the x/y sides) — 2x the
    // preprocessing at any scale. Same eager-localCheckpoint pattern as
    // the iterative graph operators.
    val pref = ordered.join(sets, "doc_id")
      .select(col("doc_id"), col("set"), col("sz"),
        explode(slice(col("ord"), lit(1),
          expr("CAST(sz - (sz * 4 + 4) DIV 5 + 1 AS INT)"))).as("ptok"))
      .localCheckpoint(true)
    val cand = pref.as("x").join(pref.as("y"),
        col("x.ptok") === col("y.ptok") &&
          col("x.doc_id") < col("y.doc_id") &&
          col("x.sz") * 5 >= col("y.sz") * 4 &&
          col("y.sz") * 5 >= col("x.sz") * 4)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.set").as("sa"), col("y.set").as("sb"),
        col("x.sz").as("za"), col("y.sz").as("zb"))
      .dropDuplicates("a", "b") // same pair from several shared prefix tokens
    cand
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("uni", col("za") + col("zb") - col("inter"))
      .filter(col("inter") * 5 >= col("uni") * 4)
      .select(col("a"), col("b"), expr("inter * 10000 DIV uni").as("jac_bp"))
      .orderBy("a", "b")
  }

  /** Brute-force all-pairs twin — legitimate ONLY because the slice is
    * bounded; the Spark side must reproduce it via prefix blocking. */
  val setsimJoinSql: String = """
WITH base AS (
  SELECT doc_id, list_sort(list_distinct(string_split(s, ' '))) AS st
  FROM (SELECT doc_id,
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
        FROM documents WHERE doc_id < 150)
  WHERE length(s) > 0),
sized AS (SELECT doc_id, st, len(st) AS sz FROM base WHERE len(st) > 0),
corpus AS (
  SELECT doc_id, st, sz FROM sized
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, st[1:sz-2] AS st, sz - 2 AS sz
  FROM sized WHERE doc_id % 7 = 0 AND sz >= 10),
pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         len(list_intersect(x.st, y.st)) AS inter,
         x.sz + y.sz - len(list_intersect(x.st, y.st)) AS uni
  FROM corpus x JOIN corpus y ON x.doc_id < y.doc_id)
SELECT a, b, inter * 10000 // uni AS jac_bp
FROM pairs WHERE inter * 5 >= uni * 4
ORDER BY a, b
"""

  /** BPE tokenizer training, first 3 merge rounds (Sennrich et al.
    * ACL'16) — the step that turns a corpus into a subword vocabulary:
    * start from characters, repeatedly count adjacent symbol pairs
    * (weighted by word frequency), merge the most frequent pair
    * everywhere, repeat. Fully deterministic: ties break lexicographic,
    * and the greedy LEFT-to-right non-overlapping merge is a plain
    * `aggregate` fold over each word's symbol array (("a","a") applied
    * to a·a·a merges the first two only — the fold reproduces exactly
    * that). Scale shape per round: one explode → map-side-combinable
    * pair count, a 1-row argmax broadcast back onto the 100-row word
    * frame, and a codegen'd higher-order fold — the corpus-sized work
    * is ONLY the initial token count; rounds iterate over the bounded
    * vocabulary. The DuckDB twin unrolls the same three rounds with
    * `list_reduce`. Output: (round, a, b, cnt) — the learned merge
    * table a tokenizer ships. */
  def bpeMerges(s: SparkSession, dir: String): DataFrame = {
    val words = t(s, dir, "documents")
      .select(explode(tokens(normalizeText(col("text")))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wt"))
      .orderBy(col("wt").desc, col("w")).limit(100)
    var syms = words.select(col("w"), col("wt"),
      expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms"))
    var out: DataFrame = null
    for (r <- 1 to 3) {
      val best = syms.filter(size(col("syms")) >= 2)
        .select(col("wt"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wt")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
      val merged = syms.crossJoin(broadcast(best))
        // nested CASE: the element_at(acc, -1) probe must stay behind
        // the emptiness guard (ANSI mode errors on out-of-range)
        .select(col("w"), col("wt"), expr(
          """aggregate(syms, cast(array() as array<string>), (acc, s) ->
             CASE WHEN size(acc) > 0 THEN
               CASE WHEN element_at(acc, -1) = a AND s = b
                    THEN concat(slice(acc, 1, size(acc) - 1), array(concat(a, b)))
                    ELSE concat(acc, array(s)) END
             ELSE concat(acc, array(s)) END)""").as("syms"))
        .localCheckpoint(true)
      val row = best.select(lit(r).as("round"), col("a"), col("b"), col("cnt"))
      out = if (out == null) row else out.unionByName(row)
      syms = merged
    }
    out.orderBy("round")
  }

  val bpeMergesSql: String = {
    def round(k: Int): String = s"""
p$k AS (
  SELECT a, b, SUM(wt) AS cnt FROM (
    SELECT wt, syms[g.i] AS a, syms[g.i+1] AS b
    FROM s${k - 1}, unnest(range(1, len(syms))) g(i)
    WHERE len(syms) >= 2)
  GROUP BY a, b),
b$k AS (SELECT a, b, CAST(cnt AS BIGINT) AS cnt FROM p$k ORDER BY cnt DESC, a, b LIMIT 1),
s$k AS (
  SELECT w, wt,
         list_reduce(list_transform(syms, x -> [x]),
           (acc, x) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = b$k.a AND x[1] = b$k.b
                            THEN list_append(acc[1:len(acc)-1], b$k.a || b$k.b)
                            ELSE list_append(acc, x[1]) END) AS syms
  FROM s${k - 1}, b$k)"""
    s"""
WITH norm AS (
  SELECT trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
  FROM documents),
toks AS (
  SELECT tok AS w, COUNT(*) AS wt
  FROM (SELECT unnest(string_split(s, ' ')) AS tok FROM norm WHERE length(s) > 0)
  GROUP BY tok ORDER BY wt DESC, w LIMIT 100),
s0 AS (
  SELECT w, wt, list_transform(range(1, length(w) + 1), i -> w[i:i]) AS syms
  FROM toks),${round(1)},${round(2)},${round(3)}
SELECT 1 AS round, a, b, cnt FROM b1
UNION ALL SELECT 2, a, b, cnt FROM b2
UNION ALL SELECT 3, a, b, cnt FROM b3
ORDER BY round
"""
  }

  /** Bigram-LM quality scoring (the CCNet/Wenzek et al. 2020 move: rank
    * documents by language-model fit; low average log-probability =
    * noisy text): a bigram LM is counted over the WHOLE corpus token
    * stream, prefix counts derive from the bigram table (so conditional
    * probabilities sum to 1 by construction, no smoothing needed —
    * every scored bigram is in the LM because the corpus contains the
    * doc), and each bounded doc's first 50 tokens are scored.
    *
    * Float discipline: a sum of ln() values is shuffle-order-dependent
    * — irreproducible. Each bigram's log-prob is floor-truncated to
    * integer micro-nats FIRST (one deterministic scalar chain:
    * divide → ln → ×1e6 → floor), then summed EXACTLY as longs; the
    * only post-sum float ops are two scalar divisions. Same pattern as
    * q_zscore_outliers' truncated z. Scale shape: LM build is one
    * explode + two map-side-combinable aggs; scoring joins are
    * equi-joins on bigram/prefix keys. */
  def lmScore(s: SparkSession, dir: String): DataFrame = {
    val pairs = "transform(sequence(1, size(toks) - 1), " +
      "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"
    val docs = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"),
        tokens(normalizeText(col("text"))).as("toks"))
    val bi = docs.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(pairs)).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
    val lm = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val lm1 = lm.groupBy("w1").agg(sum("c2").as("c1"))
    val sb = docs.filter(col("doc_id") < 300)
      .select(col("doc_id"), slice(col("toks"), 1, 50).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(pairs)).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
    sb.join(lm, Seq("w1", "w2")).join(lm1, Seq("w1"))
      .select(col("doc_id"),
        floor(log(col("c2").cast("double") / col("c1").cast("double")) * 1e6)
          .cast("long").as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("lp_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("lp_sum").cast("double") / 1e6 / col("n_bigrams").cast("double"))
          .as("avg_logprob"))
      .orderBy("doc_id")
  }

  val lmScoreSql: String = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(s) > 0 THEN string_split(s, ' ') ELSE [] END AS toks
  FROM (SELECT doc_id,
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
        FROM documents)),
bi AS (
  SELECT doc_id, toks[g.i] AS w1, toks[g.i+1] AS w2
  FROM d, unnest(range(1, len(toks))) g(i) WHERE len(toks) >= 2),
lm AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY w1, w2),
lm1 AS (SELECT w1, SUM(c2) AS c1 FROM lm GROUP BY w1),
sb AS (
  SELECT doc_id, t2[g.i] AS w1, t2[g.i+1] AS w2
  FROM (SELECT doc_id, toks[1:50] AS t2 FROM d
        WHERE doc_id < 300 AND len(toks[1:50]) >= 2),
       unnest(range(1, len(t2))) g(i)),
sc AS (
  SELECT doc_id,
         CAST(floor(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 1e6) AS BIGINT) AS lp
  FROM sb JOIN lm USING (w1, w2) JOIN lm1 USING (w1))
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(lp) AS DOUBLE) / 1e6 / COUNT(*) AS avg_logprob
FROM sc GROUP BY doc_id ORDER BY doc_id
"""

  /** Temperature-scaled mixture allocation (α-sampling, the
    * multilingual-training knob of XLM-R / Gopher data mixing): source
    * quotas proportional to n_i^α with α = 0.5, which up-weights small
    * sources relative to plain proportional mixing (q_mixture_sample is
    * the α = 1 case). Exactness discipline: the only float op is ONE
    * scalar sqrt per source, floor-truncated to integer micro-units;
    * everything after — the shares, the floor quotas, the
    * largest-remainder distribution of the leftover budget — is exact
    * long arithmetic (house pattern shared with q_mixture_sample).
    * Scalar totals arrive as broadcast singleton rows and the
    * remainder rank runs through the range-partitioned PrefixSum, so
    * no global single-partition window exists even when the source
    * dimension grows with the corpus (per-domain sources at 100 TB). */
  def mixtureTemperature(s: SparkSession, dir: String): DataFrame = {
    val budget = 200L
    // The source dimension is staged once (lazy checkpoint): the stot
    // scalar, the leftover scalar, and the PrefixSum rank all read the
    // same sources-cardinality blocks instead of each branch re-scanning
    // the documents table — ONE corpus scan per invocation (r8 fix).
    // stot rides as a collected literal (one head over the blocks)
    // rather than a broadcast crossJoin plan branch; leftover still
    // needs a second tiny aggregate (fq is stot-dependent) but reads
    // the same blocks.
    val src = t(s, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("sw", floor(sqrt(col("n_docs").cast("double")) * 1e6).cast("long"))
      .localCheckpoint(false)
    // coalesce + max(_,1): an empty corpus must yield an empty result,
    // not an NPE on the null sum / a 0-divisor literal.
    val stot = math.max(
      src.agg(coalesce(sum("sw"), lit(0L))).head().getLong(0), 1L)
    val alloc0 = src
      .withColumn("fq", expr(s"(sw * $budget) DIV ${stot}"))
      .withColumn("rem", expr(s"(sw * $budget) % ${stot}"))
    graft.operators.PrefixSum
      .rank(alloc0, -col("rem"), Seq(col("rem").desc, col("source")), "rn",
        preStaged = true,
        // rem ∈ [0, stot) and is pseudo-uniform (a mod-stot residue) —
        // literal grid cuts, no stats job
        keyRange = Some((-stot.toDouble, 0d)))
      .crossJoin(broadcast(alloc0.agg((lit(budget) - sum(col("fq"))).as("leftover"))))
      .withColumn("quota",
        col("fq") + when(col("rn") <= col("leftover"), 1L).otherwise(0L))
      .select(col("source"), col("n_docs"), col("sw"), col("quota"))
      .orderBy("source")
  }

  val mixtureTemperatureSql: String = """
WITH a0 AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1e6) AS BIGINT) AS sw
  FROM documents GROUP BY source),
a1 AS (
  SELECT source, n_docs, sw,
         CAST(sw * 200 // (SELECT SUM(sw) FROM a0) AS BIGINT) AS fq,
         CAST(sw * 200 % (SELECT SUM(sw) FROM a0) AS BIGINT) AS rem
  FROM a0)
SELECT source, n_docs, sw,
       fq + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                      <= 200 - (SELECT SUM(fq) FROM a1)
                 THEN 1 ELSE 0 END AS quota
FROM a1 ORDER BY source
"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_substr_dedup" -> (substrDedup _),
    "q_bpe_merges" -> (bpeMerges _),
    "q_lm_score" -> (lmScore _),
    "q_mixture_temperature" -> (mixtureTemperature _),
    "q_setsim_join" -> (setsimJoin _))

  val oracles: Map[String, String] = Map(
    "q_substr_dedup" -> substrDedupSql,
    "q_bpe_merges" -> bpeMergesSql,
    "q_lm_score" -> lmScoreSql,
    "q_mixture_temperature" -> mixtureTemperatureSql,
    "q_setsim_join" -> setsimJoinSql)
}
