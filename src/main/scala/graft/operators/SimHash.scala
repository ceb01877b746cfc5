package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting (Charikar '02, as used for web-scale
  * near-dup detection in Manku et al. WWW'07).
  *
  * Per doc: hash every token to `nBits` bits; for each bit position sum
  * +1/−1 votes across tokens; the sign vector packed into a long is the
  * fingerprint. The token hash is the first 8 hex chars of md5 parsed as
  * an unsigned 32-bit value — md5 (not xxhash64) so a DuckDB oracle can
  * reproduce the fingerprints bit-for-bit (same trick as
  * MinHashDedup.signatures; xxhash64 has no cross-engine twin).
  *
  * Shape at scale: explode(tokens) → groupBy(doc) is one shuffle keyed by
  * doc id; the per-bit votes are map-side partial sums. No all-pairs
  * anything. `hammingPairs` adds the Manku pigeonhole-block candidate
  * join for near-fingerprint (Hamming ≤ k) matches — equi-join on block
  * values, never a cross join.
  */
object SimHash {

  /** Adds `simhash` to one-row-per-doc input. `tokensCol` must be an
    * array<string> column; docs with no tokens drop out (no votes).
    *
    * Fingerprints up to 64 bits (Manku WWW'07's production width, r14):
    * the token-hash basis is one 32-bit md5 word for nBits ≤ 32 and TWO
    * words (hex chars 1–8 and 9–16 — both DuckDB-decodable via
    * `substr(md5(tk), start, 8)`) above, so bit i votes from word i/32.
    * The pack ORs disjoint bit terms instead of adding them: bit 63's
    * term is Long.MinValue, which an ANSI-mode SUM would reject as
    * overflow but OR composes exactly (the twin packs the same value as
    * an addition whose one negative term keeps it in range). */
  def withSimhash(docs: DataFrame, idCol: String, tokensCol: Column,
                  nBits: Int = 32): DataFrame = {
    require(nBits >= 1 && nBits <= 64, "fingerprint is at most 64 bits (two 32-bit md5 words)")
    // Native basis (graft.plans.Md5PrefixLong): digest bytes → long
    // directly, skipping the per-token hex render + substring + radix
    // parse of the composed spelling — value-identical by
    // Md5PrefixLongSpec, so the DuckDB twin's CAST('0x'||substr(md5..))
    // decode is unchanged. This is the signature hot path: ONE digest
    // per (doc, token) row at any width — above 32 bits the basis is
    // the 16-hex (signed 64-bit) decode, whose HIGH word is hex chars
    // 1–8 and LOW word chars 9–16, so bit i of word i/32 reads as a
    // plain shift off one column (arithmetic sign-extension is
    // harmless under the &1).
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val basis = ColumnBridge.column(graft.plans.Md5PrefixLong(
      ColumnBridge.expression(col("__tok")), if (nBits <= 32) 8 else 16))
    val tok = docs.select(col(idCol), explode(tokensCol).as("__tok"))
      .withColumn("__h", basis)
    def bit(i: Int): Column =
      if (nBits <= 32) shiftright(col("__h"), i).bitwiseAND(1)
      else if (i < 32) shiftright(col("__h"), 32 + i).bitwiseAND(1)
      else shiftright(col("__h"), i - 32).bitwiseAND(1)
    val votes = (0 until nBits).map { i =>
      sum(when(bit(i) === 1, 1).otherwise(-1)).as(s"__v$i")
    }
    val agg = tok.groupBy(idCol).agg(votes.head, votes.tail: _*)
    val packed = (0 until nBits).map { i =>
      when(col(s"__v$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    agg.select(col(idCol), packed.as("simhash"))
  }

  /** Cluster docs sharing a simhash; `cluster_size` > 1 ⇒ near-dup set.
    *
    * The input feeds two consumers (rows + counts) and Catalyst does not
    * share subplans across a self-join, so the signature frame — tiny,
    * one (id, long) row per doc — is eagerly materialized first; the
    * token-hash aggregation behind it runs once, not twice. */
  def clusters(withSim: DataFrame, idCol: String): DataFrame = {
    val sim = withSim.localCheckpoint(true)
    val counts = sim.groupBy("simhash").agg(count(lit(1)).as("cluster_size"))
    sim.join(counts, "simhash").select(col(idCol), col("simhash"), col("cluster_size"))
  }

  /** All-ones mask of width `w` bits, 64-safe: `(1L << 64) - 1` is 0 in
    * Java shift semantics (the ADVICE-r13 silent-degenerate-bucket bug
    * for a full-width 64-bit block), so width ≥ 64 returns -1L. */
  private[graft] def maskOf(w: Int): Long = if (w >= 64) -1L else (1L << w) - 1

  /** Pigeonhole block-key structs (blk, bval) of an `nBits` fingerprint
    * split into `nBlocks` contiguous blocks — shared by [[hammingPairs]],
    * [[hammingClusters]] and the SimHashTier dev tool, so the tool's
    * bucket-width report measures exactly the production join's key
    * space. Arithmetic shiftright sign-extension (64-bit fingerprints
    * are negative when bit 63 is set) is masked off by `maskOf`. */
  private[graft] def blockKeys(sim: Column, nBits: Int, nBlocks: Int): Seq[Column] = {
    val bounds = (0 to nBlocks).map(b => b * nBits / nBlocks)
    (0 until nBlocks).map { b =>
      val (lo, hi) = (bounds(b), bounds(b + 1))
      struct(lit(b).as("blk"),
        shiftright(sim, lo).bitwiseAND(lit(maskOf(hi - lo))).as("bval"))
    }
  }

  /** Linear-output near-dup clustering — the operator a 100 TB dedup
    * pipeline actually consumes. [[hammingPairs]]' output is QUADRATIC
    * in copy count on replica-heavy corpora (every cross-copy pair is a
    * true pair — 485M rows at the r13 100× tier, output-bound by
    * construction); a dedup decision only needs cluster membership, so
    * this emits STAR EDGES instead: within every pigeonhole (blk, bval)
    * bucket, each member pairs only with the bucket's min-id
    * representative (popcount-verified ≤ maxDist), giving ≤ nBlocks
    * edge rows per doc — linear — and [[ConnectedComponents]] closes
    * the transitive clusters through the hubs in O(log n) rounds.
    *
    * Semantics contract (mirrored exactly by the DuckDB twin): clusters
    * are connected components of the VERIFIED star graph. That graph is
    * a SUBSET of the full pairwise Hamming graph — two docs within
    * maxDist of each other but both > maxDist from their shared bucket
    * rep connect only if some chain of verified star edges links them —
    * so this is the standard representative-linking approximation, not
    * a drop-in replacement for [[hammingPairs]]' exact pair relation.
    * On replica clusters (the case that matters at scale) every copy is
    * within maxDist of the rep and the cluster is recovered exactly.
    * No wide-bucket handling is needed: a bucket of ANY width emits
    * width−1 edges, so mega-buckets cost linear work by construction.
    *
    * Output: one row per doc that appears in a verified edge —
    * (`idCol`, component = min reachable id, cluster_size). Docs with
    * no near-dup partner are singletons and do not appear. */
  def hammingClusters(withSim: DataFrame, idCol: String, nBits: Int = 32,
                      maxDist: Int = 2): DataFrame = {
    require(maxDist >= 0 && maxDist + 1 <= nBits, "need at least one bit per block")
    val sim = withSim.localCheckpoint(true)
    val nBlocks = maxDist + 1
    val blocked = sim
      .select(col(idCol), col("simhash"),
        explode(array(blockKeys(col("simhash"), nBits, nBlocks): _*)).as("bb"))
      .select(col(idCol), col("simhash"), col("bb.blk").as("blk"), col("bb.bval").as("bval"))
    // min(struct(id, simhash)) rides the rep's OWN fingerprint out of
    // the same aggregation (ids are unique, so the struct min is the
    // min-id row) — no second join to fetch it.
    val reps = blocked.groupBy("blk", "bval")
      .agg(min(struct(col(idCol).as("i"), col("simhash").as("s"))).as("r"))
      .select(col("blk"), col("bval"), col("r.i").as("__rid"), col("r.s").as("__rsim"))
    val edges = blocked.join(reps, Seq("blk", "bval"))
      .filter(col(idCol) =!= col("__rid") &&
        bit_count(col("simhash").bitwiseXOR(col("__rsim"))) <= maxDist)
      .select(col("__rid").as("src"), col(idCol).as("dst"))
      .distinct()
    val comp = ConnectedComponents.components(edges)
    comp.join(ConnectedComponents.clusterSizes(comp), "component")
      .select(col("id").as(idCol), col("component"), col("cluster_size"))
  }

  /** Pairs within Hamming distance ≤ `maxDist` of each other, via the
    * Manku WWW'07 pigeonhole split: `nBits` split into `maxDist + 1`
    * contiguous blocks — a pair differing in ≤ maxDist bits must agree
    * exactly on at least one whole block. Candidates = equi-join per
    * (block index, block value); verification = popcount of the XOR.
    *
    * A block is only ~nBits/(maxDist+1) bits (≈11 for 32/3), so block
    * VALUES have at most a few thousand distinct values and bucket
    * width grows LINEARLY with corpus size — the plain per-bucket
    * self-join is quadratic in width (measured: ≈ width² growth at the
    * 100× tier before r13). Buckets wider than `maxBucket` therefore
    * RECURSE the pigeonhole instead of self-joining: members of a wide
    * (blk, bval) bucket already agree on block blk, so a qualifying
    * pair's ≤ maxDist differing bits all lie in the REMAINING bits —
    * by the same pigeonhole they must agree on at least one of
    * maxDist+1 contiguous sub-blocks of those remaining bits. The wide
    * path joins on (blk, bval, sub-block, sub-value), shrinking bucket
    * width by ~2^(remBits/(maxDist+1)) (~128× at 32/3) per level. One
    * level is exact (it only refines candidate GENERATION; popcount
    * verification is unchanged) and is enough through the 100× tier;
    * at corpus sizes where sub-buckets grow wide again the same
    * rewrite applies recursively. Wide-bucket detection is one
    * map-side-combined count per distinct (blk, bval), broadcast —
    * the same narrow/wide split shape as MinHashDedup.candidatePairs.
    *
    * Input must carry (`idCol`, `simhash`); output (id_a, id_b, hamming).
    */
  def hammingPairs(withSim: DataFrame, idCol: String, nBits: Int = 32,
                   maxDist: Int = 2, maxBucket: Int = 256): DataFrame = {
    require(maxDist >= 0 && maxDist + 1 <= nBits, "need at least one bit per block")
    // Same self-join recompute guard as `clusters`: materialize the
    // (id, simhash) frame once before fanning out to x/y sides.
    val sim = withSim.localCheckpoint(true)
    val nBlocks = maxDist + 1
    val bounds = (0 to nBlocks).map(b => b * nBits / nBlocks)
    val blocked = sim
      .select(col(idCol), col("simhash"),
        explode(array(blockKeys(col("simhash"), nBits, nBlocks): _*)).as("bb"))
      .select(col(idCol), col("simhash"), col("bb.blk").as("blk"), col("bb.bval").as("bval"))
    // --- exactly-once emission, no dedup shuffle -------------------
    // A qualifying pair agrees on one or more blocks, so the naive
    // form emits it once per agreeing block (and once per agreeing
    // sub-block on the wide path) and dedups with distinct() — an
    // exchange carrying the WHOLE output. On replica-heavy corpora the
    // true output is itself quadratic in copy count (every cross-copy
    // pair is a near-dup), so that distinct shuffled ~0.5G rows at the
    // 100× tier. Instead each pair is emitted ONLY at its FIRST
    // agreeing block (all earlier blocks must disagree — both
    // fingerprints ride the join row, so the check is a few bit ops),
    // and within a wide block only at its first agreeing sub-block.
    // The first agreeing block is a property of the fingerprint pair,
    // not of the path, and a (blk, bval) bucket is globally wide or
    // narrow — so exactly one path emits each pair, exactly once, and
    // the union needs no distinct at all.
    def bVal(sim: Column, b: Int): Column = {
      val (lo, hi) = (bounds(b), bounds(b + 1))
      shiftright(sim, lo).bitwiseAND(lit(maskOf(hi - lo)))
    }
    def earlierBlocksDisagree(b: Int): Column =
      (0 until b).map(bp => bVal(col("x.simhash"), bp) =!= bVal(col("y.simhash"), bp))
        .foldLeft(lit(true))(_ && _)
    // Popcount verification runs inside the join projection, before
    // any exchange: failing candidates die map-side.
    def selfPairs(rows: DataFrame, keys: Seq[String], emitOnce: Column): DataFrame =
      rows.as("x").join(rows.as("y"),
          keys.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _) &&
            col(s"x.$idCol") < col(s"y.$idCol"))
        .filter(emitOnce)
        .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("int").as("hamming"))
        .filter(col("hamming") <= maxDist)
    val narrowOnce = (0 until nBlocks).map(b =>
      col("x.blk") === b && earlierBlocksDisagree(b)).reduce(_ || _)
    // Small corpora skip the narrow/wide split entirely: even a
    // maximally skewed bucket is cheap to self-join when n is tens of
    // thousands, and the split's fixed cost (width groupBy + broadcast
    // + anti-join + empty wide union) measured ~+0.6 s at bench scale.
    // `sim` is already eagerly checkpointed, so the count is free.
    if (sim.count() <= 64L * maxBucket)
      return selfPairs(blocked, Seq("blk", "bval"), narrowOnce)
    // Wide-bucket detection: one map-side-combined count per distinct
    // (blk, bval), eagerly staged (tiny by construction) so the agg runs
    // once across its anti-join and wide-rows consumers.
    val wide = blocked.groupBy("blk", "bval")
      .agg(count(lit(1)).as("__bw")).filter(col("__bw") > maxBucket)
      .select("blk", "bval")
      .localCheckpoint(true)
    // No bucket is actually wide (large but well-spread corpora — the
    // common case once blocks are ≥ ~20 bits): the plain per-bucket
    // self-join IS the right plan; engaging the split would pay the
    // anti-join plus an empty wide union for nothing (ADVICE r13: the
    // old unconditional `require` below also aborted such corpora on
    // configs that cannot recurse).
    if (wide.isEmpty) return selfPairs(blocked, Seq("blk", "bval"), narrowOnce)
    // Configs that cannot recurse — remaining bits of some block fewer
    // than nBlocks sub-blocks (e.g. maxDist=0, or nBits too small) —
    // fall back to the plain self-join: quadratic in the wide bucket's
    // width, but for these configs that is the true output shape anyway
    // (maxDist=0 wide buckets are replica sets whose every pair is
    // emitted) and silent-degenerate sub-masks are never built.
    val canRecurse = (0 until nBlocks).forall(b =>
      nBits - (bounds(b + 1) - bounds(b)) >= nBlocks)
    if (!canRecurse) return selfPairs(blocked, Seq("blk", "bval"), narrowOnce)
    val narrow = blocked.join(broadcast(wide), Seq("blk", "bval"), "left_anti")
    val narrowPairs = selfPairs(narrow, Seq("blk", "bval"), narrowOnce)
    // Remaining bits of block b = low [0,lo) ++ high [hi,nBits) packed
    // contiguously, then re-split into nBlocks sub-blocks. remBits is
    // the same for every b only when nBlocks divides nBits evenly, so
    // compute per block; the sub-explode multiplies only WIDE rows.
    // Shifts stay 64-safe: the high part is masked to its true width
    // BEFORE the shiftleft (sign-extension from 64-bit fingerprints
    // would otherwise ride up), and hi = nBits means no high bits at
    // all (shiftright by 64 is shiftright by 0 in Java semantics).
    def rvOf(sim: Column, b: Int): Column = {
      val (lo, hi) = (bounds(b), bounds(b + 1))
      val high = if (hi >= nBits) lit(0L)
        else shiftleft(shiftright(sim, hi).bitwiseAND(lit(maskOf(nBits - hi))), lo)
      high.bitwiseOR(sim.bitwiseAND(lit(maskOf(lo))))
    }
    def sVal(sim: Column, b: Int, sb: Int): Column = {
      val (lo, hi) = (bounds(b), bounds(b + 1))
      val remBits = nBits - (hi - lo)
      val (slo, shi) = (sb * remBits / nBlocks, (sb + 1) * remBits / nBlocks)
      shiftright(rvOf(sim, b), slo).bitwiseAND(lit(maskOf(shi - slo)))
    }
    val wideRows = blocked.join(broadcast(wide), Seq("blk", "bval"))
    val subbed = (0 until nBlocks).map { b =>
      val subs = (0 until nBlocks).map { sb =>
        struct(lit(sb).as("sblk"), sVal(col("simhash"), b, sb).as("sbval"))
      }
      wideRows.filter(col("blk") === b)
        .select(col(idCol), col("simhash"), col("blk"), col("bval"),
          explode(array(subs: _*)).as("ss"))
        .select(col(idCol), col("simhash"), col("blk"), col("bval"),
          col("ss.sblk").as("sblk"), col("ss.sbval").as("sbval"))
    }.reduce(_ unionByName _)
    val wideOnce = (for { b <- 0 until nBlocks; sb <- 0 until nBlocks } yield
      col("x.blk") === b && col("x.sblk") === sb && earlierBlocksDisagree(b) &&
        (0 until sb).map(sp => sVal(col("x.simhash"), b, sp) =!= sVal(col("y.simhash"), b, sp))
          .foldLeft(lit(true))(_ && _)).reduce(_ || _)
    val widePairs = selfPairs(subbed, Seq("blk", "bval", "sblk", "sbval"), wideOnce)
    narrowPairs.unionByName(widePairs)
  }
}
