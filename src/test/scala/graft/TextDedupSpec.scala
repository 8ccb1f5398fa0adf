package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

class TextDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("fingerprints are whitespace/case-insensitive and content-sensitive") {
    val df = docsDf(Seq(
      (1L, "Hello   World"),
      (2L, "hello world"),
      (3L, "hello there")))
      .select(col("doc_id"),
        TextAnalysis.fingerprintMd5(col("text")).as("md5"),
        TextAnalysis.fingerprintPoly(col("text")).as("poly"))
    val rows = df.collect().map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[String]("md5"), r.getAs[Long]("poly"))).toMap
    assert(rows(1L) === rows(2L))
    assert(rows(1L) !== rows(3L))
  }

  test("exactDedup keeps lowest doc_id per normalized content") {
    val df = docsDf(Seq((10L, "a b c"), (7L, "A  B C"), (3L, "different text")))
    val kept = Dedup.exactDedup(df).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept === Set(7L, 3L))
  }

  test("jaccard: identical docs score 1e6, disjoint docs 0") {
    val df = docsDf(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "entirely unrelated words appear here today")))
    val pairs = Dedup.jaccardPairs(df, minJaccardE6 = 0L, shingleN = 2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Long]("jaccard_e6")).toMap
    assert(pairs((1L, 2L)) === 1000000L)
    assert(pairs((1L, 3L)) === 0L)
  }

  test("containment: a token-prefix doc is fully contained, direction matters") {
    // Doc 2 is a token-level prefix of doc 1: every prefix shingle is
    // a contiguous window of the full doc, so containment(2→1) is
    // exactly 1e6 while the reverse direction dilutes with doc 1's
    // extra shingles — the asymmetry symmetric Jaccard cannot see.
    val full = (0 until 20).map(i => s"tok$i").mkString(" ")   // 18 3-shingles
    val prefix = (0 until 17).map(i => s"tok$i").mkString(" ") // 15, all ⊂ full
    val df = docsDf(Seq((1L, full), (2L, prefix),
      (3L, "entirely unrelated words appear here today")))
    val rows = Dedup.containmentPairs(df, minContainE6 = 500000L)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("contain_ab_e6"), r.getAs[Long]("contain_ba_e6")))).toMap
    assert(rows.contains((1L, 2L)), s"prefix pair missed: $rows")
    val (ab, ba) = rows((1L, 2L))
    assert(ba === 1000000L)            // prefix fully inside the full doc
    assert(ab === 15L * 1000000L / 18L) // 833333: diluted direction
    assert(!rows.keySet.exists(p => p._1 === 3L || p._2 === 3L))
  }

  test("quality-aware survivor: the longest cluster member is kept, not the min id") {
    // Doc 1 (min id) is the SHORT variant; docs 2 and 3 append
    // suffixes. The min-id rule would keep 1; the quality rule must
    // keep 3, the longest.
    val base = (0 until 30).map(i => s"tok$i").mkString(" ")
    val df = docsDf(Seq(
      (1L, base),
      (2L, base + " extra1"),
      (3L, base + " extra1 extra2"),
      (9L, "entirely unrelated words appear here today and tomorrow")))
    val rows = Dedup.keepBestPerCluster(df, minJaccardE6 = 500000L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
          r.getAs[Long]("n_tokens"), r.getAs[Boolean]("kept")))).toMap
    assert(rows.keySet === Set(1L, 2L, 3L), s"clustered: ${rows.keySet}")
    assert(rows.values.map(_._1).toSet.size === 1, "one cluster expected")
    assert(rows.values.forall(_._2 === 3L))
    assert(rows(3L)._4 === true, "longest member must be kept")
    assert(rows(1L)._4 === false && rows(2L)._4 === false)
    assert(rows(3L)._3 === 32L && rows(1L)._3 === 30L)
  }

  test("minhash estimate approximates exact jaccard for near-dups") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 57).map(i => s"tok$i").mkString(" ") + " x y z"
    val df = docsDf(Seq((1L, base), (2L, nearDup)))
    val sigs = df.select(col("doc_id"),
      Dedup.minhashSignature(Dedup.shingleHashes(col("text"), 3), 64).as("sig"))
    val a = sigs.as("a"); val b = sigs.as("b")
    val est = a.join(b, col("a.doc_id") < col("b.doc_id"))
      .select(Dedup.minhashJaccardE6(col("a.sig"), col("b.sig"), 64).as("est"))
      .collect().head.getAs[Long]("est")
    val exact = Dedup.jaccardPairs(df, 0L, shingleN = 3)
      .collect().head.getAs[Long]("jaccard_e6")
    // 64 permutations: stderr ~ sqrt(j(1-j)/64) ~ 0.05
    assert(math.abs(est - exact) < 200000L, s"est=$est exact=$exact")
  }

  test("native WinnowFingerprints is bit-identical to the fold form, incl. degenerate docs") {
    val docs = docsDf(Seq(
      1L -> (1 to 40).map(i => s"tok${i % 13}").mkString(" "), // repeats → dup minima
      2L -> (1 to 8).map(i => s"w$i").mkString(" "),           // exactly one window
      3L -> "too short",                                       // below k+w-1 → dropped
      4L -> "",                                                // empty
      5L -> (1 to 100).map(i => s"u$i").mkString(" ")))
    val native = Dedup.winnowFingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val fold = Dedup.winnowFingerprintsFold(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    // The fold form keeps empty-fps rows that the native path filters;
    // compare on the native key set and assert the extras are empty.
    assert(native.keySet === Set(1L, 2L, 5L))
    native.foreach { case (id, fps) => assert(fps === fold(id), s"doc $id") }
    assert(fold.keySet.diff(native.keySet).forall(id => fold(id).isEmpty))
    // One full window → exactly one fingerprint.
    assert(native(2L).length === 1)
  }

  test("winnowing guarantee: a shared run of >= w+k-1 tokens yields a shared fingerprint") {
    // B embeds 8 consecutive tokens of A (w+k-1 = 8 for k=4, w=5)
    // inside unrelated context; C is fully unrelated.
    val run = (10 to 17).map(i => s"shared$i").mkString(" ")
    val docs = docsDf(Seq(
      1L -> s"alpha beta gamma $run delta epsilon zeta eta theta",
      2L -> s"one two three four $run five six seven eight nine",
      3L -> (1 to 30).map(i => s"other$i").mkString(" ")))
    val pairs = Dedup.winnowPairs(docs, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"guarantee violated: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"false match: $pairs")
  }

  test("winnowPairs maxDocFreq drops boilerplate-driven pairs, keeps genuine overlap") {
    // Docs 1 and 2 share a long UNIQUE run; every doc carries the same
    // boilerplate header. Uncapped, the boilerplate fingerprints pair
    // everything with everything; capped at 2, only the genuine pair
    // survives (its run-fingerprints live in exactly 2 docs).
    val boiler = (1 to 10).map(i => s"license$i").mkString(" ")
    val run = (1 to 10).map(i => s"unique$i").mkString(" ")
    val docs = docsDf(Seq(
      1L -> s"$boiler $run alpha beta",
      2L -> s"$boiler gamma $run delta",
      3L -> s"$boiler other words entirely here now",
      4L -> s"$boiler more unrelated content goes here"))
    val uncapped = Dedup.winnowPairs(docs, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size > 1, s"boilerplate should pair everything: $uncapped")
    val capped = Dedup.winnowPairs(docs, minShared = 1L, maxDocFreq = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((1L, 2L)), s"cap should keep only the genuine pair: $capped")
  }

  test("sCurveHalfE6: exact dyadic closed form at the config extremes") {
    // 1 band × k rows: p = τ^k = 2^-16 → floor(1e6/65536) = 15.
    assert(Dedup.sCurveHalfE6(1, 16) === 15L)
    // k bands × 1 row: p = 1 - (1 - 1/2)^16 = 1 - 2^-16.
    assert(Dedup.sCurveHalfE6(16, 1) === (BigInt(65535) * 1000000 / 65536).toLong)
    // Monotone in bands for fixed k (more, shorter bands = more permissive).
    val s = Seq((1, 16), (2, 8), (4, 4), (8, 2), (16, 1))
      .map { case (b, r) => Dedup.sCurveHalfE6(b, r) }
    assert(s === s.sorted)
  }

  test("lshTuning: exact copies are always recalled; recall is monotone in bands") {
    // Ten distinct base docs + three exact copies (J = 1e6 — above any
    // τ, caught by EVERY config), so n_truth >= 3 and every config's
    // true_pos >= 3: an exact copy shares all k signature positions,
    // hence every band key.
    val base = (1 to 10).map(i =>
      (i.toLong, (1 to 30).map(j => s"w${i}_$j").mkString(" ")))
    val copies = (1 to 3).map(i => (100L + i, base(i - 1)._2))
    val rows = Dedup.lshTuning(docsDf(base ++ copies)).collect()
      .sortBy(r => r.getAs[Int]("bands"))
    assert(rows.length === 5)
    val nTruth = rows.head.getAs[Long]("n_truth")
    assert(nTruth >= 3L, s"planted exact copies must be in truth, got $nTruth")
    rows.foreach { r =>
      assert(r.getAs[Long]("true_pos") >= 3L,
        s"config ${r.getAs[Int]("bands")}x${r.getAs[Int]("rows_per_band")} missed an exact copy")
    }
    // Candidate sets only grow as bands get shorter: recall is monotone.
    val recalls = rows.map(_.getAs[Long]("recall_e6"))
    assert(recalls === recalls.sorted, s"recall not monotone: ${recalls.toSeq}")
  }

  test("jaccardEstQuality: identical docs land in bucket 10 with zero estimator error") {
    val df = docsDf(Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "wholly different words over here")))
    val r = Dedup.jaccardEstQuality(df, shingleN = 2, k = 16).collect()
      .map(x => x.getAs[Long]("bucket") -> x).toMap
    // The identical pair: exact = est = 1e6 exactly (same shingle set
    // -> same signature), so bucket 10 carries zero error.
    assert(r(10L).getAs[Long]("n_pairs") === 1L)
    assert(r(10L).getAs[Long]("max_abs_err_e6") === 0L)
    // The two dissimilar pairs share no shingles: exact 0, and any
    // estimator error comes only from signature collisions.
    assert(r(0L).getAs[Long]("n_pairs") === 2L)
  }

  test("native ShingleHashes is bit-identical to the fold form, incl. degenerate docs") {
    val docs = graft.sources.Tables.documents(spark, Sf).limit(200)
      .select(col("doc_id"), col("text"))
      .withColumn("__th", Dedup.tokenHashes(col("text")))
    val both = docs.select(
      Dedup.shinglesFromTokenHashes(col("__th"), 3).as("native"),
      Dedup.shinglesFromTokenHashesFold(col("__th"), 3).as("fold"))
    assert(both.filter(col("native") =!= col("fold")).count() === 0)
    // Short doc (< n tokens) and NULL token array -> empty, not null.
    val edge = Seq((1L, Some("one two")), (2L, None)).toDF("doc_id", "text")
      .withColumn("__th", Dedup.tokenHashes(col("text")))
      .select(Dedup.shinglesFromTokenHashes(col("__th"), 3).as("sh"))
      .collect().map(_.getSeq[Long](0))
    assert(edge.forall(_.isEmpty))
    // Out-of-contract token hashes (negative / wrapping) stay total
    // and land in [0, P) — no silent negative shingles.
    val raw = Seq(Seq(-4965676366866126659L, 8286623314361712435L, -7L, 42L)).toDF("th")
      .select(Dedup.shinglesFromTokenHashes(col("th"), 2).as("sh"))
      .collect().head.getSeq[Long](0)
    assert(raw.nonEmpty && raw.forall(v => v >= 0 && v < Dedup.P))
  }

  test("native MinHashSig is bit-identical to the fold-based form, incl. empty shingles") {
    val docs = graft.sources.Tables.documents(spark, Sf).limit(200)
      .select(col("doc_id"), col("text"))
    val staged = Dedup.withShingles(docs, "text", 3)
    val both = staged.select(
      Dedup.minhashSignature(col("sh"), 16).as("native"),
      Dedup.minhashSignatureFold(col("sh"), 16).as("fold"))
    assert(both.filter(col("native") =!= col("fold")).count() === 0)
    // Degenerate doc (too short to shingle) -> sentinel signature.
    val empty = docsDf(Seq((1L, "x")))
    val sig = Dedup.withShingles(empty, "text", 3)
      .select(Dedup.minhashSignature(col("sh"), 4).as("s"))
      .collect().head.getSeq[Long](0)
    assert(sig === Seq.fill(4)(Dedup.P))
    // Out-of-contract inputs (raw 64-bit hashes, incl. negatives and
    // Long-wrap products): the native form stays total and in [0, P)
    // with Java-wrap pmod semantics (the fold form can't even be
    // compared here — ANSI mode raises ARITHMETIC_OVERFLOW on the
    // wrapped multiply). Reference values computed driver-side.
    val rawVals = Seq(-4965676366866126659L, 8286623314361712435L, 42L)
    val raw = Seq(rawVals).toDF("sh")
    val native = raw.select(Dedup.minhashSignature(col("sh"), 8).as("n"))
      .collect().head.getSeq[Long](0)
    val P = Dedup.P
    val want = graft.functions.MinHashFunctions.params(8).map { case (a, b) =>
      rawVals.map { x => val h = (x * a + b) % P; if (h < 0) h + P else h }.min
    }
    assert(native === want)
    assert(native.forall(v => v >= 0 && v < P))
  }

  test("null array elements propagate to null, not an undefined hash") {
    // containsNull=true input: a null token/shingle hash must yield a
    // null result (as the fold forms would), never be read as 0 and
    // silently folded into every minimum/shingle (ADVICE r2).
    val withNull = Seq(
      (1L, Seq[java.lang.Long](1L, null, 3L)),
      (2L, Seq[java.lang.Long](1L, 2L, 3L))).toDF("id", "arr")
    val sigs = withNull
      .select(col("id"), Dedup.minhashSignature(col("arr"), 4).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(sigs(1L) === true, "null element must give a null signature")
    assert(sigs(2L) === false)
    val shingles = withNull
      .select(col("id"),
        graft.functions.ShingleFunctions.shingleHashes(col("arr"), 2).as("sh"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(shingles(1L) === true, "null element must give null shingles")
    assert(shingles(2L) === false)
    // The pipeline wrapper coalesces that null to the documented
    // empty-set form, same as a null text.
    val viaPipeline = withNull
      .select(Dedup.shinglesFromTokenHashes(col("arr"), 2).as("sh"))
      .collect().map(_.getSeq[Long](0))
    assert(viaPipeline.exists(_.isEmpty) && viaPipeline.exists(_.nonEmpty))
  }

  test("repetition stats: fractions and flag on hand-built docs") {
    val df = docsDf(Seq(
      (1L, "a a a a"),            // 3/4 dup tokens, top bigram (a,a) = 3/3
      (2L, "w x y z"),            // all distinct, every bigram unique
      (3L, "")))                  // empty -> zeros
    val out = graft.operators.TextAnalysis.repetitionStats(df)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("dup_token_frac_e6") === 750000L)
    assert(out(1L).getAs[Long]("top_bigram_frac_e6") === 1000000L)
    assert(out(1L).getAs[Long]("repetitive") === 1L)
    assert(out(2L).getAs[Long]("dup_token_frac_e6") === 0L)
    assert(out(2L).getAs[Long]("top_bigram_frac_e6") === 333333L)
    assert(out(2L).getAs[Long]("repetitive") === 1L) // 1/3 bigram > 20%
    assert(out(3L).getAs[Long]("n_tokens") === 0L)
    assert(out(3L).getAs[Long]("dup_token_frac_e6") === 0L)
    assert(out(3L).getAs[Long]("repetitive") === 0L)
  }

  test("decontamination finds planted benchmark overlap, broadcasts the benchmark") {
    // Doc 97 is "benchmark" (id % 97 == 0 and != 0 for the others).
    val shared = "alpha beta gamma delta epsilon"
    val df = docsDf(Seq(
      (97L, shared + " zeta"),
      (1L, shared + " omega"),     // shares 3-grams with doc 97
      (2L, "totally different words here entirely")))
    val out = graft.operators.Dedup.decontaminationOverlap(
      df, pmod(col("doc_id"), lit(97)) === 0)
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.contains(1L) && !rows.contains(2L))
    assert(rows(1L).getAs[Long]("n_overlap") === 3L) // 3-grams of the 5 shared words
    assert(rows(1L).getAs[Long]("n_bench_docs") === 1L)
    // Scale shape: the benchmark side must be broadcast — the corpus
    // never shuffles on the shingle key.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("bloom decontamination equals the exact form, even when saturated") {
    val shared = "alpha beta gamma delta epsilon"
    val df = docsDf(Seq(
      (97L, shared + " zeta"),
      (1L, shared + " omega"),
      (2L, "totally different words here entirely"),
      (194L, "another benchmark doc with its own phrasing style")))
    val pred = pmod(col("doc_id"), lit(97)) === 0
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val exact = graft.operators.Dedup.decontaminationOverlap(df, pred)
      .collect().map(key).toSet
    val bloom = graft.operators.Dedup.decontaminationOverlapBloom(df, pred)
      .collect().map(key).toSet
    assert(bloom === exact)
    // A deliberately saturated filter (64 bits for dozens of shingles)
    // floods the probe with false positives — the exact verify join
    // must still reduce to the same answer.
    val saturated = graft.operators.Dedup.decontaminationOverlapBloom(
      df, pred, mBits = 64, kProbes = 2).collect().map(key).toSet
    assert(saturated === exact)
  }

  test("vocab top-k: deterministic tf/df head with a top-k plan, not a global sort") {
    val df = docsDf(Seq(
      (1L, "apple banana apple cherry"),
      (2L, "apple banana"),
      (3L, "banana date")))
    val out = graft.operators.TextAnalysis.vocabTopK(df, k = 3)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // apple tf=3 df=2; banana tf=3 df=3 — tie broken by token string.
    assert(rows === Array(("apple", 3L, 2L), ("banana", 3L, 3L), ("cherry", 1L, 1L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }

  test("pii scan counts and redacts each category, leaves clean text alone") {
    val df = docsDf(Seq(
      (1L, "write to bob.smith+x@corp.example.org or sue@ex.io today"),
      (2L, "server 192.168.1.254 and 10.0.0.1 are up; ssn 987-65-4321"),
      (3L, "call +01 555 123 4567 about the 123-45-6789 record"),
      (4L, "no sensitive content here at all")))
    val out = graft.operators.TextAnalysis.piiStats(df)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_email") === 2L)
    assert(out(1L).getAs[Long]("pii_total") === 2L)
    assert(out(2L).getAs[Long]("n_ipv4") === 2L)
    assert(out(2L).getAs[Long]("n_ssn") === 1L)
    assert(out(3L).getAs[Long]("n_phone") === 1L)
    assert(out(3L).getAs[Long]("n_ssn") === 1L)
    assert(out(4L).getAs[Long]("pii_total") === 0L)
    // Redaction: a clean doc's md5 equals the md5 of its original text;
    // a dirty doc's differs.
    import org.apache.spark.sql.functions.{col, md5}
    val orig = df.select(col("doc_id"), md5(col("text").cast("binary")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(4L).getAs[String]("redacted_md5") === orig(4L))
    assert(out(2L).getAs[String]("redacted_md5") !== orig(2L))
  }

  test("minhash LSH finds the exact duplicate pair") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = docsDf(Seq((1L, text), (2L, text), (3L, "totally different content with many other words present")))
    val cands = Dedup.minhashCandidates(df)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.contains((1L, 3L)))
  }

  test("nearDedup drops verified near-duplicates, keeps lowest id") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " x y"
    val other = "completely different words in this one sentence that shares nothing at all"
    val df = docsDf(Seq((5L, base), (2L, nearDup), (9L, other)))
    val kept = Dedup.nearDedup(df, minJaccardE6 = 500000L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // 2 and 5 are near-dups: survivor is the lower id (2); 9 unrelated.
    assert(kept === Set(2L, 9L))
  }

  test("incremental dedup: exact beats near, near links lowest corpus id, fresh is new") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearTxt = (1 to 36).map(i => s"tok$i").mkString(" ")
    val corpus = docsDf(Seq((10L, base), (20L, base), // 10/20 duplicate each other
      (30L, "completely different corpus material nothing shared here at all")))
    val batch = docsDf(Seq(
      (101L, "  " + base.toUpperCase + "  "), // exact after normalization
      (102L, nearTxt), // 90% prefix — near-dup of 10 AND 20
      (103L, "entirely fresh words never seen in any stored document before")))
    val out = Dedup.incrementalDedup(batch, corpus, minJaccardE6 = 500000L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("verdict"),
          Option(r.getAs[java.lang.Long]("exact_dup_of")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("near_dup_of")).map(_.toLong))).toMap
    assert(out(101L)._1 === "exact_dup")
    assert(out(101L)._2 === Some(10L)) // lowest matching corpus id
    assert(out(102L) === (("near_dup", None, Some(10L))))
    assert(out(103L) === (("new", None, None)))
    // The corpus is never admitted or re-emitted: output ids = batch ids.
    assert(out.keySet === Set(101L, 102L, 103L))
  }

  test("simhash: identical texts collide, unrelated texts differ") {
    val df = docsDf(Seq(
      (1L, "spark engine window aggregate shuffle partition"),
      (2L, "spark engine window aggregate shuffle partition"),
      (3L, "cat dog bird fish lizard horse")))
      .select(col("doc_id"), Dedup.simhash32(col("text")).as("sh"))
    val m = df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sh")).toMap
    assert(m(1L) === m(2L))
    assert(m(1L) !== m(3L))
    assert(m(1L) >= 0 && m(1L) < (1L << 32))
  }

  test("substring dup stats: shared windows across docs, intra-doc repeats don't count") {
    // k=3 windows. Docs 1 and 2 share the 5-token run "a b c d e"
    // (3 windows); doc 2's tail is unique. Doc 3 is pure intra-doc
    // repetition — its windows occur nowhere else, so nothing is
    // "shared" even though the doc repeats itself. Doc 4 is too short
    // to have any window.
    val df = docsDf(Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e x y z"),
      (3L, "p q p q p q p q"),
      (4L, "u v")))
    val out = Dedup.substringDupStats(df, k = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_distinct_windows"),
          r.getAs[Long]("n_shared_windows"), r.getAs[Long]("shared_frac_e6")))).toMap
    assert(out(1L) === ((3L, 3L, 3L, 1000000L)))
    // Doc 2: 6 windows, all distinct; the 3 from the shared run count.
    assert(out(2L) === ((6L, 6L, 3L, 500000L)))
    // Doc 3: 6 windows but only 2 distinct ("p q p", "q p q"); none shared.
    assert(out(3L) === ((6L, 2L, 0L, 0L)))
    assert(out(4L) === ((0L, 0L, 0L, 0L)))
  }

  test("substring dup stats: 100%-hot boilerplate window (the AQE-skew shape) stays exact") {
    // The pathological corpus ScaleBench's d12_skew_check times: one
    // boilerplate run shared by EVERY document (a web corpus's common
    // footer/license), the worst join skew d12 can manufacture — the
    // hot window hashes key rows from all n docs into one partition.
    // Correctness must be unaffected by how the hot key is split:
    // k=3 over "b1 b2 b3 b4" + unique 3-token tail per doc.
    val n = 40
    val df = docsDf((1L to n.toLong).map(i =>
      (i, s"b1 b2 b3 b4 u${i}a u${i}b u${i}c")))
    val out = Dedup.substringDupStats(df, k = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_shared_windows"),
          r.getAs[Long]("shared_frac_e6")))).toMap
    assert(out.size === n)
    // 5 windows/doc; exactly "b1 b2 b3" and "b2 b3 b4" are corpus-hot
    // (in all 40 docs); the boundary and tail windows are unique.
    out.foreach { case (id, v) =>
      assert(v === ((5L, 2L, 400000L)), s"doc $id")
    }
  }

  test("dup spans: maximal shared runs with exact positions; intra-doc repeats excluded") {
    // Docs 1 and 2 share the 5-token passage "a b c d e" embedded at
    // different offsets -> one maximal span each (3 consecutive k=3
    // windows = 5 tokens) starting where the passage starts. Doc 3 is
    // pure intra-doc repetition (ndocs=1 windows) -> no spans. Doc 4
    // is too short for any window.
    val df = docsDf(Seq(
      (1L, "x1 x2 a b c d e y1"),
      (2L, "z1 a b c d e z2 z3"),
      (3L, "p q r p q r"),
      (4L, "u v")))
    val out = Dedup.dupSpans(df, k = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_windows"), r.getAs[Long]("span_tokens"))).sorted
    assert(out === Seq((1L, 2L, 3L, 5L), (2L, 1L, 3L, 5L)))
  }

  test("dup spans: two disjoint shared passages stay two spans, not one") {
    // Docs share "a b c" AND "x y z" with unique separators between:
    // the islands must NOT merge across the gap.
    val df = docsDf(Seq(
      (1L, "a b c m1 m2 x y z"),
      (2L, "a b c n1 n2 n3 x y z")))
    val out = Dedup.dupSpans(df, k = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_tokens"))).sorted
    assert(out === Seq((1L, 0L, 3L), (1L, 5L, 3L), (2L, 0L, 3L), (2L, 6L, 3L)))
  }

  test("window decontamination: verbatim k-run hits, clean docs absent") {
    // Bench doc 1 = "q w e r t". Corpus doc 2 embeds that run (3 of
    // its 5 k=3 windows match); doc 3 shares no window; doc 4 shares
    // tokens but no 3-run.
    val df = docsDf(Seq(
      (1L, "q w e r t"),
      (2L, "a b q w e r t"),
      (3L, "completely different text here"),
      (4L, "q a w b e c r")))
    val out = Dedup.windowDecontamination(df, col("doc_id") === 1L, k = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_contaminated_windows"),
          r.getAs[Long]("contam_frac_e6")))).toMap
    assert(out.keySet === Set(2L))
    assert(out(2L) === ((5L, 3L, 600000L)))
  }

  test("chunking is case-preserving: mixed-case variants chunk to different md5s") {
    // Guards the operator/oracle tokenizer agreement: both sides
    // tokenize RAW text, so case must flow through to chunk_md5.
    val df = docsDf(Seq((1L, "Alpha beta GAMMA delta"), (2L, "alpha beta gamma delta")))
    val chunks = TextAnalysis.chunkByTokens(df, chunkTokens = 3, overlap = 1)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx")) -> r.getAs[String]("chunk_md5"))
      .toMap
    assert(chunks((1L, 0)) !== chunks((2L, 0)))
    // Same doc re-chunked is stable.
    assert(chunks((1L, 0)) === chunks((1L, 0)))
    // Window arithmetic: 4 tokens, step 2 -> starts 0 and 2.
    assert(chunks.keys.count(_._1 == 1L) === 2)
  }

  test("charset stats: exact per-class counts and e6 fractions") {
    val df = docsDf(Seq((1L, "Ab c1 é!"), (2L, "")))
    val out = TextAnalysis.charsetStats(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_cp") === 8L)
    assert(r1.getAs[Long]("n_alpha") === 3L)
    assert(r1.getAs[Long]("n_digit") === 1L)
    assert(r1.getAs[Long]("n_upper") === 1L)
    assert(r1.getAs[Long]("n_space") === 2L)
    assert(r1.getAs[Long]("n_non_ascii") === 1L) // é; '!' is ASCII
    assert(r1.getAs[Long]("alpha_frac_e6") === 375000L)
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_cp") === 0L)
    assert(r2.getAs[Long]("alpha_frac_e6") === 0L)
  }

  test("readability: exact counts and truncating e3 Flesch scores") {
    // "Hello world." -> words 2 (Hello, world), sentences 1 ("."),
    // syllable runs 3 (e, o | o).
    //   fre_e3 = 206835 - (1015*2) div 1 - (84600*3) div 2
    //          = 206835 - 2030 - 126900 = 77905
    //   fk_e3  = (390*2) div 1 + (11800*3) div 2 - 15590
    //          = 780 + 17700 - 15590 = 2890
    val df = docsDf(Seq((1L, "Hello world."), (2L, ""), (3L, "no end here")))
    val out = TextAnalysis.readability(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_words") === 2L)
    assert(r1.getAs[Long]("n_sentences") === 1L)
    assert(r1.getAs[Long]("n_syllables") === 3L)
    assert(r1.getAs[Long]("fre_e3") === 77905L)
    assert(r1.getAs[Long]("fk_grade_e3") === 2890L)
    // Empty text: all counts zero, scores NULL (no division blow-up).
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_words") === 0L)
    assert(r2.isNullAt(r2.fieldIndex("fre_e3")))
    // Words but no sentence terminator: scores NULL, counts real.
    val r3 = out(3L)
    assert(r3.getAs[Long]("n_words") === 3L)
    assert(r3.getAs[Long]("n_sentences") === 0L)
    assert(r3.isNullAt(r3.fieldIndex("fk_grade_e3")))
  }

  test("streaming dedup drops exact and near duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
      .withColumn("event_time", col("ts").cast("timestamp"))
    val q = graft.streaming.StreamingDedup
      .nearWithinWatermark(docs, "text", "event_time", "1 hour")
      .writeStream.format("memory").queryName("sdedup_out").outputMode("append").start()
    val text = "alpha beta gamma delta epsilon zeta"
    mem.addData(
      (1L, text, "2024-01-01 00:00:00"),
      (2L, text, "2024-01-01 00:05:00"), // exact dup -> identical simhash -> dropped
      (3L, "wholly different content here", "2024-01-01 00:06:00"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("sdedup_out").collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept.contains(3L))
    assert((kept & Set(1L, 2L)).size === 1) // one survivor of the dup pair
  }

  test("streaming curation admits exactly the batch gate's docs, dedups in-window copies") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
      .withColumn("event_time", col("ts").cast("timestamp"))
    // Threshold -1 so a 0-scoring doc (incl. NULL text) must be
    // ADMITTED — pins the batch-parity coalesce in the gate: a naive
    // null score would silently drop the row instead.
    val q = graft.streaming.CurationStream.admit(docs, minScoreMilli = -1L)
      .writeStream.format("memory").queryName("scur_out").outputMode("append").start()
    // Batch scores of the candidate texts decide the expectation — the
    // stream must agree doc for doc because the gate is the same
    // column expression.
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "lorem ipsum dolor sit amet consectetur",
      3L -> "the quick brown fox jumps over the lazy dog", // dup of 1
      4L -> "table scan hash join shuffle partition",
      5L -> (null: String)) // NULL text: scores 0 like the batch gate, never crashes
    import spark.implicits._
    val batchScores = TextAnalysis.hashedNgramScore(
        texts.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    mem.addData(texts.zipWithIndex.map { case ((id, t), i) =>
      (id, t, f"2024-01-01 00:0$i%d:00")
    }: _*)
    q.processAllAvailable()
    q.stop()
    val admitted = spark.table("scur_out").collect().map(_.getAs[Long]("doc_id")).toSet
    val passing = texts.collect { case (id, _) if batchScores(id) > -1 => id }.toSet
    // Every admitted doc passed the batch gate; every passing text is
    // represented by exactly one survivor (first arrival) per distinct
    // content.
    assert(admitted.subsetOf(passing))
    val dupPair = Set(1L, 3L) & passing
    if (dupPair.size == 2) assert((admitted & dupPair) === Set(1L))
    assert((passing -- Set(3L)).subsetOf(admitted))
    // Sub-threshold docs never reach the sink regardless of dedup.
    assert((admitted & texts.collect { case (id, _) if batchScores(id) <= -1 => id }.toSet).isEmpty)
    // The NULL-text doc scores 0 (> -1) and is unique content: admitted.
    assert(admitted.contains(5L))
  }

  test("streaming exact dedup collapses whitespace/case variants only") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
      .withColumn("event_time", col("ts").cast("timestamp"))
    val q = graft.streaming.StreamingDedup
      .exactWithinWatermark(docs, "text", "event_time", "1 hour")
      .writeStream.format("memory").queryName("sdedup_exact_out").outputMode("append").start()
    mem.addData(
      (1L, "Alpha  Beta", "2024-01-01 00:00:00"),
      (2L, "alpha beta", "2024-01-01 00:01:00"),   // normalized-equal -> dropped
      (3L, "alpha beta gamma", "2024-01-01 00:02:00")) // near but not exact -> kept
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("sdedup_exact_out").collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept.contains(3L))
    assert((kept & Set(1L, 2L)).size === 1)
    // Clobber guard: a pre-existing helper column fails fast.
    intercept[IllegalArgumentException] {
      graft.streaming.StreamingDedup.exactWithinWatermark(
        docs.withColumn("__fp", lit("x")), "text", "event_time")
    }
  }

  test("hashed-ngram classifier: exact score on a hand-built doc, degenerate inputs") {
    // Reference computation of the same pipeline: lowercase whitespace
    // tokens, uni+bigrams, PolyHash(31) % 4096 bucket, Knuth-mix
    // milli-weight, exact integer sum.
    val P = 1000000007L
    def polyHash(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 31 + c) % P)
    def weight(s: String): Long =
      ((polyHash(s) % 4096) * 2654435761L + 12345L) % P % 2001L - 1000L
    def expected(text: String): (Long, Long) = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val grams = toks ++ toks.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      (grams.size.toLong, grams.map(weight).sum)
    }
    val docsDf = Seq(
      (1L, "The quick Brown fox"),
      (2L, "one"),
      (3L, "   "),
      (4L, "table scan table scan")).toDF("doc_id", "text")
    val out = TextAnalysis.hashedNgramScore(docsDf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    for (id <- Seq(1L, 2L, 4L)) {
      val text = Seq("", "The quick Brown fox", "one", "", "table scan table scan")(id.toInt)
      val (n, s) = expected(text)
      assert(out(id)._1 === n, s"doc $id n_grams")
      assert(out(id)._2 === s, s"doc $id score")
      assert(out(id)._3 === (if (s > 0) "keep" else "drop"))
    }
    // Whitespace-only text: zero grams, zero score, 'drop'.
    assert(out(3L) === ((0L, 0L, "drop")))
    // Single token: exactly one gram (no bigram underflow).
    assert(out(2L)._1 === 1L)
  }

  test("hard negatives exclude the planted near-dup positive, keep sub-threshold top-k") {
    import graft.operators.Similarity
    val e = graft.sources.Tables.embeddings(spark, Sf)
    val origs = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val copies = e.select(col("vec_id"),
      transform(col("embedding"), (x, d) =>
        x.cast("double") * (lit(1.0) + (pmod(col("vec_id") + d, lit(7)) - 3).cast("double") / 100.0))
        .as("embedding"))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val v = origs.unionByName(copies)
    val q = v.filter(col("vec_id") < 5)
    val negs = Similarity.hardNegatives(q, v, k = 5, posThr = 0.9).collect()
    // The ~0.999-cosine twin (id + 1e6) is a positive — never mined.
    assert(!negs.exists(r => r.getAs[Long]("neighbor_id") === r.getAs[Long]("query_id") + 1000000L))
    assert(negs.forall(_.getAs[Double]("cos_sim") < 0.9))
    // 5 queries x top-5 negatives, hardest-first.
    assert(negs.length === 25)
    // Without the threshold, each query's #1 IS the twin — proving the
    // filter is what excluded it.
    val unfiltered = Similarity.bruteForceTopK(q, v, k = 1).collect()
    assert(unfiltered.forall(r =>
      r.getAs[Long]("neighbor_id") === r.getAs[Long]("query_id") + 1000000L))
  }

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      (1L, "the cat and the dog in a house"),
      (2L, "der hund und die katze ist nicht hier"),
      (3L, "le chat et la maison est un lieu"),
      (4L, "el perro y el gato no es por aqui"),
      (5L, "你好世界"),
      (6L, "xyzzy plugh")).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang"))
    val m = df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    assert(m === Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es", 5L -> "zh", 6L -> "und"))
  }

  test("quality score rewards long clean stopword-bearing text") {
    val good = "the quick brown fox jumps over the lazy dog and then the fox rests " * 5
    val bad = "@@@@ ####"
    val df = Seq((1L, good), (2L, bad)).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.qualityE6(col("text")).as("q"))
    val m = df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("q")).toMap
    assert(m(1L) > m(2L))
    assert(m.values.forall(q => q >= 0 && q <= 1000000))
  }

  test("d23 rare-shingle containment finds the low-Jaccard fragment d14's banding targets miss") {
    // Container: 30 distinct tokens; fragment: its first 10 tokens —
    // full containment (every fragment shingle is in the container)
    // but Jaccard = 8/28 ≈ 0.29. A third unrelated doc must pair with
    // neither.
    val toks = (1 to 30).map(i => s"tok$i")
    val container = toks.mkString(" ")
    val fragment = toks.take(10).mkString(" ")
    val other = (1 to 30).map(i => s"zzz$i").mkString(" ")
    val out = Dedup.rareShingleContainment(
        docsDf(Seq((1L, container), (2L, fragment), (3L, other))))
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("cont_e6"), r.getAs[Long]("jaccard_e6")))
    // Only the (fragment -> container) direction clears the 0.8 bar:
    // the reverse containment is 8/28 and doc 3 shares no shingles.
    assert(out.toSeq === Seq((2L, 1L, 1000000L, 8L * 1000000L / 28L)))
  }

  test("d23 direction: containment is asymmetric, equal docs hit both directions") {
    val a = (1 to 12).map(i => s"w$i").mkString(" ")
    val out = Dedup.rareShingleContainment(docsDf(Seq((1L, a), (2L, a))))
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("cont_e6"))).toSet
    assert(out === Set((1L, 2L, 1000000L), (2L, 1L, 1000000L)))
  }
}
