package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, HashOps, LangId, Multimodal, Similarity, TextOps, Fingerprint64}

class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  test("token_count edge cases") {
    val df = Seq("", "   ", "a", "a b", "a  b\n c").toDF("t")
    val got = df.select(TextOps.token_count(col("t"))).as[Int].collect().toSeq
    assert(got == Seq(0, 0, 1, 2, 3))
  }

  test("words expression is exactly the filter(split(lower)) chain") {
    // the one-pass tokenizer must match the former interpreted
    // formulation on every input class: ascii, punctuation-only, empty,
    // unicode lowercase targets (Kelvin sign K lowers to ascii 'k'),
    // multi-byte separators, leading/trailing separators, nulls
    val cases = Seq(
      "Hello World", "  !a-b__9  ", "", "!!!", "über straße",
      "Kelvin sign", "中文 mixed ascii42", "a", "9",
      "tab\tand\nnewline", null)
    val df = cases.toDF("t")
    val viaExpr = df.select(TextOps.words(col("t"))).as[Seq[String]].collect()
    val viaChain = df.select(
      filter(split(lower(col("t")), "[^a-z0-9]+"), x => x =!= ""))
      .as[Seq[String]].collect()
    assert(viaExpr.toSeq == viaChain.toSeq)
    // and over the real corpus, in bulk
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
      TextOps.words(col("text")).as("a"),
      filter(split(lower(col("text")), "[^a-z0-9]+"), x => x =!= "").as("b"))
      .filter(not(col("a") === col("b"))).count()
    assert(diff == 0)
  }

  test("subword_count: alpha runs, digit runs, punctuation marks") {
    val df = Seq("hello world", "abc123 x!", "a-b.c", "").toDF("t")
    val got = df.select(TextOps.subword_count(col("t"))).as[Int].collect().toSeq
    // "hello","world" | "abc","123","x","!" | "a","-","b",".","c" | none
    assert(got == Seq(2, 4, 5, 0))
  }

  test("lang_id detects planted languages") {
    val samples = Seq(
      ("the cat and the dog is in the house with it", "en"),
      ("der hund und die katze ist nicht mit ein mann", "de"),
      ("el perro y la casa es un lugar que los gatos", "es"),
      ("le chien est dans une maison pour les chats et", "fr"),
      ("这是一个中文句子 语言识别 测试 文本", "zh"),
      ("", "und"),
      ("12345 67890", "und")
    )
    samples.foreach { case (txt, want) =>
      assert(LangId.detect(txt) == want, s"for: $txt")
    }
    // via the Catalyst expression too
    val got = samples.map(_._1).toDF("t")
      .select(TextOps.lang_id(col("t"))).as[String].collect().toSeq
    assert(got == samples.map(_._2))
  }

  test("fingerprint64: stable, whitespace-normalized, case-insensitive") {
    assert(Fingerprint64("Hello  World") == Fingerprint64("hello world"))
    assert(Fingerprint64("hello world") != Fingerprint64("world hello"))
    val viaExpr = Seq("Hello  World").toDF("t")
      .select(TextOps.fingerprint64(col("t"))).as[Long].head()
    assert(viaExpr == Fingerprint64("hello world"))
  }

  test("quality_score in [0,1] on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mm = docs.select(min(TextOps.quality_score(col("text"))),
                         max(TextOps.quality_score(col("text"))))
      .as[(Double, Double)].head()
    assert(mm._1 >= 0.0 && mm._2 <= 1.0)
  }
}

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  /** Same planted corpus as SparkEntry's q25-q28. */
  private lazy val corpus = {
    docs.filter(col("doc_id") < 60).select(col("doc_id").as("id"), col("text"))
      .union(docs.filter(col("doc_id") < 30)
        .select((col("doc_id") + 10000).as("id"), col("text")))
      .union(docs.filter(col("doc_id") >= 30 && col("doc_id") < 60)
        .select((col("doc_id") + 20000).as("id"),
                concat(col("text"), lit(" zz qq")).as("text")))
  }

  test("exact dedup finds exactly the planted duplicate clusters") {
    val clusters = Dedup.exactClusters(corpus, "id", "text")
      .filter(col("n_dups") > 1)
      .select(col("canonical_id"), col("n_dups"))
      .as[(Long, Long)].collect().toMap
    assert(clusters.keySet == (0L until 30L).toSet)
    assert(clusters.values.forall(_ == 2L))
    val survivors = Dedup.dropExactDups(corpus, "id", "text").count()
    assert(survivors == corpus.count() - 30)
  }

  test("fused text minhash is bit-identical to minhash(shingles(words))") {
    // the banding path rides HashOps.minhashText — pin bit-equality
    // against the composed form on the full corpus, plus the
    // null-iff-(< n words) drop semantics, for both q27's and the
    // at-scale leg's (n, numHashes) configs and edge-case texts
    val edge = Seq((90001L, ""), (90002L, "one two"), (90003L, "one two three"),
                   (90004L, "  A!  b2,c  d "), (90005L, "x x x x"))
      .toDF("id", "text")
    val all = corpus.union(edge)
    for ((n, k) <- Seq((3, 32), (5, 16))) {
      val composed = all.select(
          col("id"), Dedup.shingles(col("text"), n).as("sh"))
        .select(col("id"), size(col("sh")).as("nsh"),
                Dedup.minhashSignature(col("sh"), k).as("sig"))
        .as[(Long, Int, Array[Long])].collect()
      val fused = all.select(
          col("id"),
          graft.ops.HashOps.minhash_text_col(col("text"), n, k).as("sig"))
        .as[(Long, Option[Array[Long]])].collect().toMap
      composed.foreach { case (id, nsh, sig) =>
        val got = fused(id)
        if (nsh == 0) assert(got.isEmpty, s"id=$id: expected null sig")
        else assert(got.isDefined && got.get.toSeq == sig.toSeq,
                    s"id=$id n=$n k=$k: fused ${got.map(_.toSeq)} vs composed ${sig.toSeq}")
      }
    }
  }

  test("minhash LSH finds all planted exact and near duplicates") {
    val pairs = Dedup.minhashNearDups(corpus, "id", "text",
                                      shingleN = 3, numHashes = 32,
                                      rowsPerBand = 4, threshold = 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    (0L until 30L).foreach(i =>
      assert(pairs.contains((i, i + 10000)), s"exact dup pair $i missing"))
    (30L until 60L).foreach(i =>
      assert(pairs.contains((i, i + 20000)), s"near dup pair $i missing"))
  }

  test("cosineSim expression is bit-identical to the aggregate/zip_with chain") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("nid"), col("embedding").as("nv"))
    val dot = aggregate(zip_with(col("qv"), col("nv"),
                                 (x, y) => x.cast("double") * y.cast("double")),
                        lit(0.0), (acc, z) => acc + z)
    def norm(v: org.apache.spark.sql.Column) =
      sqrt(aggregate(transform(v, x => x.cast("double") * x.cast("double")),
                     lit(0.0), (acc, z) => acc + z))
    val both = c.crossJoin(q)
      .select((dot / (norm(col("qv")) * norm(col("nv")))).as("chain"),
              HashOps.cosine_sim_col(col("qv"), col("nv")).as("expr"))
    // UNROUNDED doubles must be bitwise-equal (same fold order, same
    // sqrt association); <=> is null-safe so a null mismatch also fails
    assert(both.filter(not(col("chain") <=> col("expr"))).count() == 0)
    assert(both.count() > 0)
  }

  test("bandBuckets expression is bit-identical to the transform/slice/xxhash64 chain") {
    // the codegen'd one-pass banding must reproduce Catalyst's
    // xxhash64(slice(sig, b*rpb+1, rpb), b) EXACTLY for every band —
    // a changed bucket hash silently reshapes every LSH bucket
    val rowsPerBand = 4
    val numHashes = 32
    val bands = numHashes / rowsPerBand
    val sigs = docs.select(col("doc_id"),
      Dedup.minhashSignature(
        Dedup.shingles(col("text"), 3), numHashes).as("sig"))
      .filter(size(col("sig")) > 0)
    val oldChain = sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + 1,
                            lit(rowsPerBand)), b)))
        .as(Seq("band", "bucket")))
      .as[(Long, Int, Long)].collect().toSet
    val newExpr = sigs.select(col("doc_id"),
      posexplode(HashOps.band_buckets_col(col("sig"), rowsPerBand))
        .as(Seq("band", "bucket")))
      .as[(Long, Int, Long)].collect().toSet
    assert(newExpr == oldChain,
           s"band buckets diverged: ${newExpr.diff(oldChain).take(3)}")
    assert(newExpr.size == sigs.count() * bands)
  }

  test("minhash LSH pairs are a subset of exact-jaccard pairs (no FPs)") {
    val lsh = Dedup.minhashNearDups(corpus, "id", "text", 3, 32, 4, 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(corpus, "id", "text", 3, 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"LSH emitted non-pairs: ${lsh.diff(exact).take(5)}")
    assert(lsh.size >= exact.size * 6 / 10, s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("cappedIdPairs: caps buckets, counts drops, keeps smallest ids") {
    val banded = Seq(
      // bucket with 5 ids, cap 3 -> pairs among {1,2,3} only, 2 dropped
      (0, 10L, 5L), (0, 10L, 3L), (0, 10L, 1L), (0, 10L, 4L), (0, 10L, 2L),
      // second band re-pairs (1,5): survives via its other band
      (1, 20L, 1L), (1, 20L, 5L)
    ).toDF("band", "bucket", "id")
    val acc = spark.sparkContext.longAccumulator("test_dropped")
    val pairs = graft.ops.LshPairs.cappedIdPairs(banded, cap = 3, acc = Some(acc))
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 5L)))
    assert(acc.value == 2L, s"dropped count: ${acc.value}")
  }

  test("worst case: near-identical corpus completes with capped buckets") {
    // 400 copies of one document — the pathological all-in-one-bucket
    // input; uncapped this is 400² pairs in one task per band
    val clones = (0L until 400L)
      .map(i => (i, "the same warehouse operator text repeated for dedup"))
      .toDF("id", "text")
    val acc = spark.sparkContext.longAccumulator("worst_dropped")
    val banded = clones.select(col("id"), lit(0).as("band"), lit(0L).as("bucket"))
    val capped = graft.ops.LshPairs.cappedIdPairs(
      banded.select("band", "bucket", "id"), cap = 32, acc = Some(acc))
    assert(capped.count() == 32L * 31 / 2)
    assert(acc.value == 400L - 32L)
    // the full operators stay bounded too (and still verify exactly)
    val mh = Dedup.minhashNearDups(clones, "id", "text", 3, 32, 4, 0.5,
                                   maxBucket = 32).count()
    assert(mh == 32L * 31 / 2, s"minhash pair count: $mh")
    val sh = Dedup.simhashNearDups(clones, "id", "text", 3, maxBucket = 32).count()
    assert(sh == 32L * 31 / 2, s"simhash pair count: $sh")
  }

  test("banded exchange carries ids only — no shingle arrays shuffle") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val df = Dedup.minhashNearDups(corpus, "id", "text", 3, 32, 4, 0.5)
    val plan: SparkPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "expected at least one shuffle in the LSH plan")
    exchanges.foreach { e =>
      val fat = e.output.filter(_.dataType == ArrayType(StringType))
      assert(fat.isEmpty,
             s"exchange shuffles shingle arrays: ${fat.map(_.name)}\n$e")
    }
  }

  test("simhash finds planted duplicates at hamming 0") {
    val pairs = Dedup.simhashNearDups(corpus, "id", "text", maxHamming = 3)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .as[(Long, Long, Int)].collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    (0L until 30L).foreach { i =>
      assert(byPair.get((i, i + 10000)).contains(0), s"simhash missed exact dup $i")
    }
    // near dups (2 appended words) stay within the hamming budget mostly
    val nearFound = (30L until 60L).count(i => byPair.contains((i, i + 20000)))
    assert(nearFound >= 20, s"simhash near-dup recall too low: $nearFound/30")
  }
}

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("typed brute-force top-k equals a driver-side exact computation") {
    val all = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val queries = (0L until 5L).toSeq
    val qSet = queries.toSet
    val want = queries.map { q =>
      val qv = all.find(_._1 == q).get._2
      val top = all.filter(t => !qSet.contains(t._1))
        .map { case (id, v) => (id, Similarity.cosine(qv, v)) }
        .sortBy(t => (-t._2, t._1)).take(5).map(_._1).toVector
      q -> top
    }.toMap
    val got = Similarity.bruteForceTopK(spark, emb, "vec_id", "embedding", queries, 5)
      .collect().groupBy(_.query_id)
      .map { case (q, rs) =>
        q -> rs.sortBy(r => (-r.sim, r.neighbor_id)).map(_.neighbor_id).toVector
      }
    assert(got == want)
  }

  test("LSH ANN: deterministic, plausible recall vs brute force") {
    val queries = (0L until 10L).toSeq
    val brute = Similarity.bruteForceTopK(spark, emb, "vec_id", "embedding", queries, 5)
      .collect().groupBy(_.query_id).view
      .mapValues(_.map(_.neighbor_id).toSet).toMap
    val lsh = Similarity.lshTopK(spark, emb, "vec_id", "embedding", queries, 5,
                                 tables = 8, bits = 6)
      .collect().groupBy(_.query_id).view
      .mapValues(_.map(_.neighbor_id).toSet).toMap
    val recall = queries.map { q =>
      brute(q).intersect(lsh.getOrElse(q, Set.empty)).size.toDouble / 5.0
    }.sum / queries.size
    assert(recall >= 0.3, s"LSH recall vs brute force too low: $recall")
    // multiprobe (hamming-1 buckets) must not lose recall, should gain
    val lshMp = Similarity.lshTopK(spark, emb, "vec_id", "embedding", queries, 5,
                                   tables = 8, bits = 6, probes = 6)
      .collect().groupBy(_.query_id).view
      .mapValues(_.map(_.neighbor_id).toSet).toMap
    val recallMp = queries.map { q =>
      brute(q).intersect(lshMp.getOrElse(q, Set.empty)).size.toDouble / 5.0
    }.sum / queries.size
    assert(recallMp >= recall, s"multiprobe lost recall: $recallMp < $recall")
    assert(recallMp >= 0.5, s"multiprobe recall too low: $recallMp")
    // determinism
    val lsh2 = Similarity.lshTopK(spark, emb, "vec_id", "embedding", queries, 5,
                                  tables = 8, bits = 6)
      .collect().groupBy(_.query_id).view
      .mapValues(_.map(_.neighbor_id).toSet).toMap
    assert(lsh == lsh2)
  }

  test("LSH ANN worst case: one-bucket corpus stays bounded, drops counted") {
    // identical vectors -> identical signatures in EVERY table: the
    // whole corpus lands in one (table, bucket) per table. Uncapped,
    // each probed bucket would feed |corpus| candidates per query.
    val v = Array.tabulate(16)(i => (i + 1).toFloat)
    val clones = (0L until 500L).map(i => (i, v)).toDF("vec_id", "embedding")
    val acc = spark.sparkContext.longAccumulator("ann_worst_dropped")
    val cap = 32
    val got = Similarity.lshTopK(spark, clones, "vec_id", "embedding",
                                 queryIds = Seq(0L, 1L), k = 5,
                                 tables = 4, bits = 6, bucketCap = cap,
                                 acc = Some(acc))
      .collect().groupBy(_.query_id)
    // top-k still valid and deterministic: smallest non-query ids win
    // (all sims are 1.0, ties break by neighbor id)
    assert(got(0L).map(_.neighbor_id).sorted.toSeq == Seq(2L, 3L, 4L, 5L, 6L))
    assert(got(1L).map(_.neighbor_id).sorted.toSeq == Seq(2L, 3L, 4L, 5L, 6L))
    // every probed bucket truncated: 498 candidates -> cap, per table
    assert(acc.value > 0, "expected counted drops on the one-bucket corpus")
    assert(acc.value >= 2L * 4L * (498L - cap), s"drop count: ${acc.value}")
  }

  test("LSH ANN exchanges carry no vectors (ids-only shuffles)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val df = Similarity.lshTopK(spark, emb, "vec_id", "embedding",
                                (0L until 10L).toSeq, 5, tables = 8,
                                bits = 6, probes = 4).toDF()
    val plan: SparkPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "expected shuffles in the ANN plan")
    exchanges.foreach { e =>
      val fat = e.output.filter(_.dataType == ArrayType(FloatType))
      assert(fat.isEmpty,
             s"exchange shuffles embedding vectors: ${fat.map(_.name)}")
    }
  }

  test("IVF ANN: deterministic, plausible recall vs brute force") {
    val queries = (0L until 10L).toSeq
    val brute = Similarity.bruteForceTopK(spark, emb, "vec_id", "embedding", queries, 5)
      .collect().groupBy(_.query_id).view
      .mapValues(_.map(_.neighbor_id).toSet).toMap
    def run() = Similarity
      .ivfTopK(spark, emb, "vec_id", "embedding", queries, 5,
               nCells = 16, nProbe = 4)
      .collect().groupBy(_.query_id).view
      .mapValues(_.map(_.neighbor_id).toSet).toMap
    val ivf = run()
    val recall = queries.map { q =>
      brute(q).intersect(ivf.getOrElse(q, Set.empty)).size.toDouble / 5.0
    }.sum / queries.size
    assert(recall >= 0.3, s"IVF recall vs brute force too low: $recall")
    assert(run() == ivf) // deterministic
    // probing more cells must not lose recall
    val full = Similarity
      .ivfTopK(spark, emb, "vec_id", "embedding", queries, 5,
               nCells = 16, nProbe = 16)
      .collect().groupBy(_.query_id).view
      .mapValues(_.map(_.neighbor_id).toSet).toMap
    val recallFull = queries.map { q =>
      brute(q).intersect(full.getOrElse(q, Set.empty)).size.toDouble / 5.0
    }.sum / queries.size
    assert(recallFull >= recall, s"more probes lost recall: $recallFull < $recall")
    // probing ALL cells IS brute force
    assert(recallFull == 1.0, s"all-cell probe should be exact: $recallFull")
  }

  test("distributed k-means: deterministic, no corpus collect, good IVF recall") {
    val queries = (0L until 10L).toSeq
    val c1 = Similarity.kmeansDistributed(spark, emb, "vec_id", "embedding",
                                          nCells = 16, iters = 8)
    val c2 = Similarity.kmeansDistributed(spark, emb, "vec_id", "embedding",
                                          nCells = 16, iters = 8)
    assert(c1.length == 16)
    // deterministic for a fixed input layout (partition-ordered fold)
    c1.zip(c2).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
    // full-corpus-trained quantizer plugs into the same IVF search and
    // holds recall vs brute force
    val brute = Similarity.bruteForceTopK(spark, emb, "vec_id", "embedding", queries, 5)
      .collect().groupBy(_.query_id).view
      .mapValues(_.map(_.neighbor_id).toSet).toMap
    val ivf = Similarity
      .ivfTopK(spark, emb, "vec_id", "embedding", queries, 5,
               nCells = 16, nProbe = 4, centroidsOpt = Some(c1))
      .collect().groupBy(_.query_id).view
      .mapValues(_.map(_.neighbor_id).toSet).toMap
    val recall = queries.map { q =>
      brute(q).intersect(ivf.getOrElse(q, Set.empty)).size.toDouble / 5.0
    }.sum / queries.size
    assert(recall >= 0.3, s"IVF recall with distributed training too low: $recall")
  }

  test("codegen hyperplane signatures are bit-identical to signatureAt") {
    // the banding paths (cosineNearDups / IncrementalAnn.bands) ride the
    // codegen'd HashOps.hyperplaneSigs — pin bit-equality against the
    // scalar signatureAt reference for every row, table and bit width
    val rows = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    assert(rows.nonEmpty)
    for (bits <- Seq(10, 16); tables <- Seq(2, 8); seed <- Seq(7L, 42L)) {
      val got = emb
        .select(col("vec_id").cast("long").as("id"),
                graft.ops.HashOps.hyperplane_sigs_col(
                  col("embedding"), tables, bits, seed).as("sigs"))
        .as[(Long, Array[Long])].collect().toMap
      rows.foreach { case (id, vec) =>
        val want = (0 until tables)
          .map(t => Similarity.signatureAt(vec, seed, t, bits).toLong)
        assert(got(id).toSeq == want,
               s"sig mismatch id=$id bits=$bits tables=$tables seed=$seed")
      }
    }
  }

  test("codegen verify kernel is bit-identical to Similarity.cosine + rint") {
    val rows = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val pairsDf = emb.select(col("vec_id").cast("long").as("id_a"),
                             col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").cast("long").as("id_b"),
                            col("embedding").as("vb")))
      .filter(col("id_a") < col("id_b") && col("id_b") < 30)
      .select(col("id_a"), col("id_b"),
              graft.ops.HashOps.cosine_rint4_col(col("va"), col("vb")).as("c"))
      .as[(Long, Long, Double)].collect()
    assert(pairsDf.nonEmpty)
    val byId = rows.toMap
    pairsDf.foreach { case (a, b, got) =>
      val want = math.rint(Similarity.cosine(byId(a), byId(b)) * 10000) / 10000
      assert(java.lang.Double.doubleToRawLongBits(got) ==
               java.lang.Double.doubleToRawLongBits(want),
             s"cosine kernel mismatch for ($a,$b): $got vs $want")
    }
  }

  test("cosine near-dup finds all planted duplicate vectors") {
    val planted = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label"))
    val pairs = Similarity.cosineNearDups(spark, emb.union(planted), "vec_id",
                                          "embedding", threshold = 0.999)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    (0L until 20L).foreach(i =>
      assert(pairs.contains((i, i + 10000)), s"planted vector dup $i missing"))
  }
}

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("media table is deterministic and content-complete") {
    val m1 = Multimodal.syntheticMediaTable(spark, docs, "doc_id")
    val m2 = Multimodal.syntheticMediaTable(spark, docs, "doc_id")
    assert(m1.count() == docs.count())
    val h1 = m1.select(col("media_ref"), sha2(col("bytes"), 256))
      .as[(String, String)].collect().toMap
    val h2 = m2.select(col("media_ref"), sha2(col("bytes"), 256))
      .as[(String, String)].collect().toMap
    assert(h1 == h2)
  }

  test("image meta: schema + genuine header decode matches generator params") {
    val media = Multimodal.syntheticMediaTable(spark, docs, "doc_id")
    val meta = Multimodal.imageMeta(spark, media)
    assert(meta.columns.toSeq ==
      Seq("media_ref", "width", "height", "channels", "n_bytes"))
    val rows = meta.as[(String, Int, Int, Int, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._2 >= 16 && r._3 >= 16 &&
      (r._4 == 3 || r._4 == 4) && r._5 > 0))
    // PARSED dims must equal the pure parameter functions the encoder
    // was driven by — a bug on either side of encode->parse breaks this
    rows.foreach { case (ref, w, h, _, _) =>
      val id = ref.stripPrefix("https://media.test/m-")
        .takeWhile(_.isDigit).toLong
      val (ew, eh) = graft.ops.MediaGen.imageDims(graft.ops.MediaGen.seedOfId(id))
      assert((w, h) == (ew, eh), s"$ref: parsed ($w,$h) != params ($ew,$eh)")
    }
    val again = Multimodal.imageMeta(spark, media).as[(String, Int, Int, Int, Long)]
      .collect().toSet
    assert(rows.toSet == again)
  }

  test("frame sampling: every Nth frame, decoded-pixel hashes match contract") {
    val media = Multimodal.syntheticMediaTable(spark, docs, "doc_id")
    val frames = Multimodal.sampleFrames(spark, media, everyN = 7)
    val byRef = frames.select(col("media_ref"), col("frame_idx"), col("frame_hash"))
      .as[(String, Int, Long)].collect().groupBy(_._1)
    assert(byRef.nonEmpty)
    byRef.foreach { case (ref, fs) =>
      val idxs = fs.map(_._2).sorted.toSeq
      assert(idxs.head == 0 && idxs.forall(_ % 7 == 0))
      // hash of the LZW-DECODED pixels equals a fold of the pixel
      // function itself — end-to-end through encode + full GIF decode
      val id = ref.stripPrefix("https://media.test/m-")
        .takeWhile(_.isDigit).toLong
      val seed = graft.ops.MediaGen.seedOfId(id)
      val (w, h) = graft.ops.MediaGen.videoDims(seed)
      fs.foreach { case (_, f, got) =>
        val want = graft.ops.MediaGen.pixelFold(
          (0 until w * h).iterator.map(i => graft.ops.MediaGen.pixel(seed, f, i)))
        assert(got == want, s"$ref frame $f: decoded hash mismatch")
      }
    }
  }

  test("payloads are valid to the JDK's own decoders (ImageIO)") {
    import javax.imageio.ImageIO
    val seed = 0xabc123L
    val (pw, ph) = graft.ops.MediaGen.imageDims(seed)
    val png = ImageIO.read(new java.io.ByteArrayInputStream(
      graft.ops.MediaGen.png(pw, ph, alpha = true)))
    assert(png != null && png.getWidth == pw && png.getHeight == ph,
           "ImageIO failed to fully decode the generated PNG")
    val (gw, gh) = graft.ops.MediaGen.videoDims(seed)
    val gif = ImageIO.read(new java.io.ByteArrayInputStream(
      graft.ops.MediaGen.gif(gw, gh, 3, seed)))
    assert(gif != null && gif.getWidth == gw && gif.getHeight == gh,
           "ImageIO failed to decode the generated animated GIF")
    // JPEG: entropy data is filler by design — validate the marker
    // structure via header-only dimension read
    val jr = ImageIO.getImageReadersByFormatName("jpeg").next()
    jr.setInput(ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(graft.ops.MediaGen.jpeg(123, 77))))
    assert(jr.getWidth(0) == 123 && jr.getHeight(0) == 77)
  }

  test("GIF LZW round-trip: decoded pixels equal the pixel function") {
    val seed = 77L
    val (w, h, nFrames) = (13, 9, 4)
    val bytes = graft.ops.MediaGen.gif(w, h, nFrames, seed)
    assert(graft.ops.HeaderCodec.frameCount(bytes) == nFrames)
    assert(graft.ops.HeaderCodec.imageMeta(bytes) == ((w, h, 3)))
    (0 until nFrames).foreach { f =>
      val want = graft.ops.MediaGen.pixelFold(
        (0 until w * h).iterator.map(i => graft.ops.MediaGen.pixel(seed, f, i)))
      assert(graft.ops.HeaderCodec.frameHash(bytes, f) == want)
    }
  }

  test("frameProfile: ink + nearest-neighbor resize match the pure pixel function") {
    val seed = 31L
    val (w, h, nFrames) = (13, 9, 3)
    val bytes = graft.ops.MediaGen.gif(w, h, nFrames, seed)
    // downsample (8x8 < 13x9 in x), exact (13x9), and upsample (20x16)
    Seq((8, 8), (13, 9), (20, 16)).foreach { case (dw, dh) =>
      (0 until nFrames).foreach { f =>
        val (ink, rh) = graft.ops.HeaderCodec.frameProfile(bytes, f, dw, dh)
        val wantInk = (0 until w * h)
          .count(i => graft.ops.MediaGen.pixel(seed, f, i) != 0).toLong
        val wantRh = graft.ops.MediaGen.pixelFold(
          (0 until dh).iterator.flatMap(ty =>
            (0 until dw).iterator.map(tx =>
              graft.ops.MediaGen.pixel(seed, f, (ty * h / dh) * w + tx * w / dw))))
        assert(ink == wantInk, s"ink at ${(dw, dh)} frame $f")
        assert(rh == wantRh, s"resize hash at ${(dw, dh)} frame $f")
      }
    }
    // single-frame formats refuse (content is not LZW-decodable here)
    intercept[IllegalArgumentException] {
      graft.ops.HeaderCodec.frameProfile(
        graft.ops.MediaGen.png(20, 20, alpha = false), 0, 8, 8)
    }
  }

  test("header parser rejects garbage instead of inventing metadata") {
    val garbage = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    intercept[IllegalArgumentException] {
      graft.ops.HeaderCodec.imageMeta(garbage)
    }
    intercept[IllegalArgumentException] {
      graft.ops.HeaderCodec.frameCount(garbage)
    }
  }

  test("header parser fuzz: random and truncated payloads terminate cleanly") {
    // every call must either succeed or throw — never hang or return
    // invented metadata from random bytes; truncations of VALID payloads
    // are the realistic corruption case
    val rng = new scala.util.Random(99)
    def tryAll(bytes: Array[Byte]): Unit = {
      try graft.ops.HeaderCodec.imageMeta(bytes) catch { case _: Exception => () }
      try graft.ops.HeaderCodec.frameCount(bytes) catch { case _: Exception => () }
      try graft.ops.HeaderCodec.frameHash(bytes, 0) catch { case _: Exception => () }
      try graft.ops.HeaderCodec.sampleFrameHashes(bytes, 3).toList
      catch { case _: Exception => () }
    }
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rng.nextInt(300)); rng.nextBytes(b); tryAll(b)
    }
    val valid = Seq(
      graft.ops.MediaGen.png(33, 21, alpha = false),
      graft.ops.MediaGen.jpeg(50, 40),
      graft.ops.MediaGen.gif(9, 7, 4, seed = 5L))
    valid.foreach { v =>
      (0 until 40).foreach { _ =>
        tryAll(java.util.Arrays.copyOf(v, rng.nextInt(v.length)))
        // bit flips too
        val mut = v.clone()
        mut(rng.nextInt(mut.length)) = rng.nextInt(256).toByte
        tryAll(mut)
      }
    }
  }
}

/** Every declared query runs at sf0.001; oracle coverage is consistent. */
class QueriesSmokeSpec extends SparkSuite {
  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("all queries execute at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, dir).count()
    }
    val empties = counts.filter(_._2 == 0).keys.toSeq.sorted
    // q07/q09 are legitimately small but non-empty; nothing should be empty
    assert(empties.isEmpty, s"queries with zero rows: $empties")
  }
}

/** Incremental LSH maintenance ([[graft.ops.IncrementalLsh]]): rounds
  * of new docs against a persisted band/shingle index.
  */
class IncrementalLshSpec extends SparkSuite {
  import spark.implicits._
  import graft.ops.IncrementalLsh

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val corpus = {
    docs.filter(col("doc_id") < 60).select(col("doc_id").as("id"), col("text"))
      .union(docs.filter(col("doc_id") < 30)
        .select((col("doc_id") + 10000).as("id"), col("text")))
      .union(docs.filter(col("doc_id") >= 30 && col("doc_id") < 60)
        .select((col("doc_id") + 20000).as("id"),
                concat(col("text"), lit(" zz qq")).as("text")))
  }

  test("index compaction: folds rounds into a fresh generation; output unchanged; old gens GC'd") {
    import graft.ops.RoundSlots
    val idx = tmpDir("inclsh-compact-")
    // 4 rounds with a fold every 2: results must match the no-compaction
    // run exactly (same pairs, same emit rounds)
    def run(dir: String, every: Int) = (0 to 3).flatMap { r =>
      IncrementalLsh.roundPairs(
          spark, dir, corpus.filter(pmod(col("id"), lit(4)) === r),
          "id", "text", shingleN = 3, numHashes = 32, rowsPerBand = 4,
          threshold = 0.5, compactEvery = every)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b, j, r) }.toSet
    }.toSet
    val plain = run(tmpDir("inclsh-plain-"), 0)
    val folded = run(idx, 2)
    assert(folded == plain && folded.nonEmpty)
    // generations advanced and superseded ones are gone; the active
    // generation's slot count is bounded by the cadence, not the round
    // count (4 rounds, compactEvery=2 -> 1 folded slot + <=1 fresh)
    val gen = RoundSlots.activeGen(idx)
    assert(gen >= 1, s"expected at least one fold, active gen $gen")
    (0 until gen).foreach { j =>
      assert(!java.nio.file.Files.exists(
               java.nio.file.Paths.get(RoundSlots.genDir(idx, j))),
             s"superseded generation g$j not GC'd")
    }
    val slots = RoundSlots.roundIdxs(s"${RoundSlots.genDir(idx, gen)}/bands")
    assert(slots.size <= 2, s"unbounded slots after compaction: $slots")
    // crash-safe switch: a dangling UNCOMMITTED higher generation (fold
    // died before the marker) is invisible — reads still serve gen
    val dang = java.nio.file.Paths.get(RoundSlots.genDir(idx, gen + 1), "bands")
    java.nio.file.Files.createDirectories(dang)
    assert(RoundSlots.activeGen(idx) == gen)
    val extra = IncrementalLsh.roundPairs(
      spark, idx, corpus.limit(0), "id", "text", 3, 32, 4, 0.5)
    assert(extra.count() == 0)
  }

  test("incremental union equals batch; pairs emit in the later member's round") {
    val idx = tmpDir("inclsh-")
    val incr = (0 to 2).flatMap { r =>
      IncrementalLsh.roundPairs(
          spark, idx, corpus.filter(pmod(col("id"), lit(3)) === r),
          "id", "text", shingleN = 3, numHashes = 32, rowsPerBand = 4,
          threshold = 0.5)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b, j, r) }
    }
    // exactly-once across rounds
    assert(incr.map(t => (t._1, t._2)).distinct.size == incr.size,
           "a pair was emitted in more than one round")
    // emitted in the arrival round of the later member
    incr.foreach { case (a, b, _, r) =>
      assert(math.max(a % 3, b % 3) == r, s"pair ($a,$b) emitted in round $r")
    }
    // union == batch output (same params)
    val batch = Dedup.minhashNearDups(corpus, "id", "text", 3, 32, 4, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(incr.map(t => (t._1, t._2, t._3)).toSet == batch)
    // index now holds the full corpus postings: one more empty round
    // emits nothing new
    val extra = IncrementalLsh.roundPairs(
      spark, idx, corpus.limit(0), "id", "text", 3, 32, 4, 0.5)
    assert(extra.count() == 0)
  }

  test("incremental union equals batch at threshold 1.0 (stored-tag prefilter)") {
    // exact-dup mode rides the signature tag STORED with each posting:
    // sig-unequal candidates are suppressed at pair emission instead of
    // via a post-hoc signature join over the shingle store. The output
    // contract is unchanged — union across rounds == batch at 1.0.
    val idx = tmpDir("inclsh-exact-")
    val incr = (0 to 2).flatMap { r =>
      IncrementalLsh.roundPairs(
          spark, idx, corpus.filter(pmod(col("id"), lit(3)) === r),
          "id", "text", shingleN = 3, numHashes = 32, rowsPerBand = 4,
          threshold = 1.0)
        .as[(Long, Long, Double)].collect()
    }
    val batch = Dedup.minhashNearDups(corpus, "id", "text", 3, 32, 4, 1.0)
      .as[(Long, Long, Double)].collect().toSet
    assert(incr.size == incr.distinct.size, "duplicate pairs across rounds")
    assert(incr.toSet == batch)
    assert(batch.nonEmpty, "fixture lost its planted exact dups")
  }

  test("cappedNewPairs matchTag suppresses sig-unequal candidates at emission") {
    // same bucket, tags differ -> no pair even though ids co-bucket;
    // equal tags pair as before; untagged mode ignores the column
    val old = Seq((0, 10L, 1L, 7L), (0, 10L, 2L, 8L))
      .toDF("band", "bucket", "id", "tag")
    val neu = Seq((0, 10L, 3L, 7L)).toDF("band", "bucket", "id", "tag")
    val tagged = IncrementalLsh.cappedNewPairs(old, neu, cap = 16,
                                               matchTag = true)
      .as[(Long, Long)].collect().toSet
    assert(tagged == Set((1L, 3L)))
    val untagged = IncrementalLsh.cappedNewPairs(old, neu, cap = 16)
      .as[(Long, Long)].collect().toSet
    assert(untagged == Set((1L, 3L), (2L, 3L)))
  }

  test("a round append that died half-way is invisible and retried cleanly") {
    val idx = tmpDir("inclsh-crash-")
    val r0 = IncrementalLsh.roundPairs(
      spark, idx, corpus.filter(pmod(col("id"), lit(3)) === 0),
      "id", "text", 3, 32, 4, 0.5)
    assert(r0.count() >= 0)
    // simulate a round-1 append that wrote bands but died before
    // shingles: a dangling bands/r1 slot
    val round1 = corpus.filter(pmod(col("id"), lit(3)) === 1)
    // plant the dangling slot where the index actually READS — the
    // active generation's bands dir (a slot outside g<j> would be
    // invisible by location and make this test vacuous)
    val live = graft.ops.RoundSlots.genDir(idx, graft.ops.RoundSlots.activeGen(idx))
    IncrementalLsh.bands(round1, "id", "text")
      .write.parquet(s"$live/bands/r1")
    // the dangling slot must not be served: a no-new-docs round against
    // the index emits nothing (were the dangling bands read, round-1
    // ids would pair with nothing verifiable or crash the lookup join)
    val noop = IncrementalLsh.roundPairs(
      spark, idx, corpus.limit(0), "id", "text", 3, 32, 4, 0.5)
    assert(noop.count() == 0)
    // note: the no-op round above consumed slot r1 (overwrote the
    // dangling bands with an empty round). The retried real round lands
    // in r2; union across all rounds must still equal batch
    val incr1 = IncrementalLsh.roundPairs(
      spark, idx, round1, "id", "text", 3, 32, 4, 0.5)
    val incr2 = IncrementalLsh.roundPairs(
      spark, idx, corpus.filter(pmod(col("id"), lit(3)) === 2),
      "id", "text", 3, 32, 4, 0.5)
    val all = (r0.union(incr1).union(incr2))
      .as[(Long, Long, Double)].collect()
    val batch = Dedup.minhashNearDups(corpus, "id", "text", 3, 32, 4, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(all.length == all.distinct.length, "duplicate pairs emitted")
    assert(all.toSet == batch)
  }

  test("a slot half-written DURING the shingles write is not complete; bare 'r' dir is ignored") {
    val idx = tmpDir("inclsh-succ-")
    val r0 = IncrementalLsh.roundPairs(
      spark, idx, corpus.filter(pmod(col("id"), lit(3)) === 0),
      "id", "text", 3, 32, 4, 0.5)
    assert(r0.count() >= 0)
    // simulate a crash DURING the round-1 shingles write: bands slot
    // fully committed (_SUCCESS present), shingles slot present but
    // uncommitted (only _temporary — no _SUCCESS). Directory-existence
    // gating would serve these bands without their verification
    // shingles (silent recall loss) AND push the retry to slot r2,
    // duplicating round-1 ids across "old" rounds.
    val round1 = corpus.filter(pmod(col("id"), lit(3)) === 1)
    val live = graft.ops.RoundSlots.genDir(idx, graft.ops.RoundSlots.activeGen(idx))
    IncrementalLsh.bands(round1, "id", "text")
      .write.parquet(s"$live/bands/r1")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$live/shingles/r1/_temporary"))
    // junk subdirectory named exactly "r" must be ignored, not crash
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$live/bands/r"))
    // retry of round 1 lands back in slot r1 (overwrite, no duplicate
    // ids across rounds — no self-pairs); union across rounds == batch
    val incr1 = IncrementalLsh.roundPairs(
      spark, idx, round1, "id", "text", 3, 32, 4, 0.5)
    val incr2 = IncrementalLsh.roundPairs(
      spark, idx, corpus.filter(pmod(col("id"), lit(3)) === 2),
      "id", "text", 3, 32, 4, 0.5)
    val all = r0.union(incr1).union(incr2)
      .as[(Long, Long, Double)].collect()
    assert(all.forall { case (a, b, _) => a != b }, "self-pair emitted")
    assert(all.length == all.distinct.length, "duplicate pairs emitted")
    val batch = Dedup.minhashNearDups(corpus, "id", "text", 3, 32, 4, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(all.toSet == batch)
  }

  test("slot-pinned round replay is idempotent: same pairs, no duplicate index entries") {
    // simulates Structured Streaming's at-least-once foreachBatch: a
    // batch whose index slot COMMITTED but whose checkpoint didn't is
    // re-run with the same slot — the retry must re-read exactly the
    // prior rounds, overwrite its own slot, and later rounds must see
    // no duplicate ids (which would admit self-pairs)
    val idx = java.nio.file.Files.createTempDirectory("slotpin-").toString
    def doc(i: Long, t: String) = (i, t)
    val r0 = Seq(doc(0, "alpha beta gamma delta one"),
                 doc(3, "unrelated words entirely here")).toDF("id", "text")
    val r1 = Seq(doc(1, "alpha beta gamma delta one"),
                 doc(4, "other text again unrelated")).toDF("id", "text")
    val r2 = Seq(doc(2, "alpha beta gamma delta one")).toDF("id", "text")
    def run(df: org.apache.spark.sql.DataFrame, k: Int) =
      IncrementalLsh.roundPairs(spark, idx, df, "id", "text",
                                threshold = 0.5, slot = Some(k))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(run(r0, 0) == Set.empty)
    val p1 = run(r1, 1)
    assert(p1 == Set((0L, 1L)))
    val p1Replay = run(r1, 1) // the at-least-once retry
    assert(p1Replay == p1, s"replay diverged: $p1Replay")
    // a later round sees each id exactly once: no self-pairs, no dups
    val p2 = run(r2, 2)
    assert(p2 == Set((0L, 2L), (1L, 2L)), s"round 2 pairs: $p2")
    // pinning a slot with a gap fails loud, never mis-reads
    val err = intercept[IllegalArgumentException] {
      IncrementalLsh.roundPairs(spark, idx,
        Seq(doc(9, "x y z")).toDF("id", "text"), "id", "text",
        threshold = 0.5, slot = Some(5)).count()
    }
    assert(err.getMessage.contains("requires committed rounds"))
  }

  test("cappedNewPairs suppresses old-old pairs and counts drops") {
    val old = Seq((0, 10L, 1L), (0, 10L, 2L)).toDF("band", "bucket", "id")
    val neu = Seq((0, 10L, 3L), (0, 99L, 9L)).toDF("band", "bucket", "id")
    val pairs = IncrementalLsh.cappedNewPairs(old, neu, cap = 16)
      .as[(Long, Long)].collect().toSet
    // (1,2) is old-old: already emitted when 2 arrived — suppressed now;
    // bucket 99 has a single member: no pair
    assert(pairs == Set((1L, 3L), (2L, 3L)))
    // capping: 5 olds + 1 new in one bucket, cap 3 keeps {1,2,3}; only
    // pairs touching the new id (3) survive the old-old suppression
    val old2 = Seq((0, 5L, 1L), (0, 5L, 2L), (0, 5L, 4L), (0, 5L, 5L),
                   (0, 5L, 6L)).toDF("band", "bucket", "id")
    val neu2 = Seq((0, 5L, 3L)).toDF("band", "bucket", "id")
    val acc = spark.sparkContext.longAccumulator("incr_dropped")
    val p2 = IncrementalLsh.cappedNewPairs(old2, neu2, cap = 3, acc = Some(acc))
      .as[(Long, Long)].collect().toSet
    assert(p2 == Set((1L, 3L), (2L, 3L)))
    assert(acc.value == 3L, s"dropped: ${acc.value}")
  }

  test("incremental pair-gen exchanges carry no shingle arrays") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val oldBands = IncrementalLsh.bands(
      corpus.filter(pmod(col("id"), lit(2)) === 0), "id", "text")
    val newBands = IncrementalLsh.bands(
      corpus.filter(pmod(col("id"), lit(2)) === 1), "id", "text")
    val pairs = IncrementalLsh.cappedNewPairs(oldBands, newBands, cap = 1024)
    val plan: SparkPlan = pairs.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      val fat = e.output.filter(_.dataType == ArrayType(StringType))
      assert(fat.isEmpty, s"exchange shuffles arrays: ${fat.map(_.name)}")
    }
  }

  test("untouched buckets never reach the pair-generation exchange") {
    // old index has 1000 postings in buckets the new round never hashes
    // into; the semi-join must prune them all before the groupBy
    val old = (0L until 1000L).map(i => (0, 1000L + i, i)).toDF("band", "bucket", "id")
    val neu = Seq((0, 7L, 5000L), (0, 7L, 5001L)).toDF("band", "bucket", "id")
    val pairs = IncrementalLsh.cappedNewPairs(old, neu, cap = 16)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((5000L, 5001L)))
  }
}

/** Incremental ANN maintenance ([[graft.ops.IncrementalAnn]]): the
  * vector-side analogue of IncrementalLshSpec — near-dup rounds against
  * a persisted hyperplane index, and the persisted IVF postings table
  * with frozen centroids + re-train cadence.
  */
class IncrementalAnnSpec extends SparkSuite {
  import spark.implicits._
  import graft.ops.{IncrementalAnn, IncrementalLsh, Similarity}

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val corpus = {
    val planted = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"),
              col("label"))
    emb.union(planted).select(col("vec_id").as("id"),
                              col("embedding").as("vec"))
  }

  test("incremental union equals batch cosineNearDups; later-member round emit") {
    val idx = tmpDir("incann-")
    val incr = (0 to 2).flatMap { r =>
      IncrementalAnn.roundPairs(
          spark, idx, corpus.filter(pmod(col("id"), lit(3)) === r),
          "id", "vec", threshold = 0.9)
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, c) => (a, b, c, r) }
    }
    assert(incr.map(t => (t._1, t._2)).distinct.size == incr.size,
           "a pair was emitted in more than one round")
    incr.foreach { case (a, b, _, r) =>
      assert(math.max(a % 3, b % 3) == r, s"pair ($a,$b) emitted in round $r")
    }
    val batch = Similarity.cosineNearDups(spark, corpus, "id", "vec",
                                          threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(incr.map(t => (t._1, t._2, t._3)).toSet == batch)
    assert(batch.nonEmpty, "degenerate: batch found no near-dups at 0.9")
    // index now holds the whole corpus: an empty extra round is a no-op
    val extra = IncrementalAnn.roundPairs(
      spark, idx, corpus.limit(0), "id", "vec", threshold = 0.9)
    assert(extra.count() == 0)
  }

  test("ANN slot-pinned round replay is idempotent (mirror of the LSH contract)") {
    val idx = tmpDir("incann-slot-")
    def run(r: Int, k: Int) =
      IncrementalAnn.roundPairs(
          spark, idx, corpus.filter(pmod(col("id"), lit(3)) === r),
          "id", "vec", threshold = 0.9, slot = Some(k))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val p0 = run(0, 0)
    val p1 = run(1, 1)
    assert(run(1, 1) == p1, "replayed ANN batch diverged")
    val p2 = run(2, 2)
    // union across rounds must still equal batch pairs (no dup ids in
    // the index after the replay, so no self-pairs / double emits)
    val batch = Similarity.cosineNearDups(spark, corpus, "id", "vec",
                                          threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert((p0 ++ p1 ++ p2) == batch)
    val err = intercept[IllegalArgumentException] {
      run(0, 7)
    }
    assert(err.getMessage.contains("requires committed rounds"))
  }

  test("verify join falls back to a shuffle join when the pair set exceeds the broadcast limit") {
    val pairs = (1L to 500L).flatMap(a => (a + 1 to math.min(a + 3, 500L))
      .map(b => (a, b))).toDF("id_a", "id_b").localCheckpoint()
    val n = pairs.count()
    val lookup = (1L to 500L).map(i => (i, Array.fill(4)(i.toFloat)))
      .toDF("id", "vec")
    // count join operators in the FINAL (post-AQE) plan rendering —
    // QueryStageExec wrappers hide subtrees from children-walks
    def countIn(df: org.apache.spark.sql.DataFrame, op: String): Int = {
      df.collect() // force execution so AQE finalizes the plan
      val s = df.queryExecution.executedPlan.toString
      s.sliding(op.length).count(_ == op)
    }
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // limit far below n * 48 bytes: guard must NOT broadcast the pair
      // set (AQE may still broadcast other small sides; assert the
      // guard's own decision via the row-count arithmetic too)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      assert(n * 48L > 1024L)
      val big = IncrementalLsh.joinPairsToLookup(spark, pairs, n, lookup)
      assert(big.count() == n) // completes, correct cardinality
      assert(countIn(big, "BroadcastHashJoin") == 0,
             "guard must not broadcast an over-limit pair set")
      // and with a generous limit the pair side IS broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (10 << 20).toString)
      val small = IncrementalLsh.joinPairsToLookup(spark, pairs, n, lookup)
      assert(countIn(small, "BroadcastHashJoin") >= 2,
             "expected broadcast pair joins")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("IvfIndex: appended rounds answer queries identically to batch ivfTopK") {
    val idx = new IncrementalAnn.IvfIndex(
      spark, tmpDir("ivfidx-"), nCells = 8, iters = 4)
    val rounds = (0 to 2).map(r => corpus.filter(pmod(col("id"), lit(3)) === r))
    val (e0, r0) = idx.append(rounds(0), "id", "vec")
    assert((e0, r0) == (0, 0))
    val (e1, r1) = idx.append(rounds(1), "id", "vec")
    val (e2, r2) = idx.append(rounds(2), "id", "vec")
    assert((e1, r1) == (0, 1) && (e2, r2) == (0, 2))
    val qids = (0L until 5L).toSeq
    val got = idx.topK(qids, k = 5, nProbe = 3).collect()
      .map(s => (s.query_id, s.neighbor_id, s.sim)).sortBy(t => (t._1, -t._3, t._2))
    // batch over the same corpus with the SAME (frozen) centroids
    val cs = idx.centroids()
    val want = Similarity.ivfTopK(spark, corpus, "id", "vec", qids, 5,
                                  nCells = 8, nProbe = 3,
                                  centroidsOpt = Some(cs)).collect()
      .map(s => (s.query_id, s.neighbor_id, s.sim)).sortBy(t => (t._1, -t._3, t._2))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("IvfIndex: an empty ingest round commits a file-less slot without wedging later reads") {
    // partitionBy of an empty frame writes a slot holding only _SUCCESS;
    // schema inference over that slot would throw on EVERY later
    // postings read — the explicit-schema read must treat it as the
    // valid empty round it is
    val idx = new IncrementalAnn.IvfIndex(
      spark, tmpDir("ivfidx-empty-"), nCells = 8, iters = 4)
    idx.append(corpus.filter(pmod(col("id"), lit(3)) === 0), "id", "vec")
    val (e1, r1) = idx.append(corpus.limit(0), "id", "vec")
    assert((e1, r1) == (0, 1))
    val (e2, r2) = idx.append(
      corpus.filter(pmod(col("id"), lit(3)) === 1), "id", "vec")
    assert((e2, r2) == (0, 2))
    val got = idx.topK((0L until 3L).toSeq, k = 3, nProbe = 3).collect()
    assert(got.nonEmpty, "queries against the index failed after an empty round")
  }

  test("IvfIndex: retrain cadence opens a new committed epoch; answers stay batch-equal") {
    val rtDir = tmpDir("ivfidx-rt-")
    val idx = new IncrementalAnn.IvfIndex(
      spark, rtDir, nCells = 8, iters = 4, retrainEvery = 2)
    val rounds = (0 to 2).map(r => corpus.filter(pmod(col("id"), lit(3)) === r))
    idx.append(rounds(0), "id", "vec")            // e0/r0
    val (e1, _) = idx.append(rounds(1), "id", "vec") // e0/r1 -> retrain -> e1/r0
    assert(e1 == 1, s"expected retrain into epoch 1, got $e1")
    assert(idx.activeEpoch() == 1 && idx.rounds() == Seq(0))
    val (e2, r2) = idx.append(rounds(2), "id", "vec") // e1/r1 -> retrain -> e2/r0
    assert((e2, r2) == (2, 0))
    val qids = (0L until 5L).toSeq
    val got = idx.topK(qids, k = 5, nProbe = 3).collect()
      .map(s => (s.query_id, s.neighbor_id, s.sim)).sortBy(t => (t._1, -t._3, t._2))
    val want = Similarity.ivfTopK(spark, corpus, "id", "vec", qids, 5,
                                  nCells = 8, nProbe = 3,
                                  centroidsOpt = Some(idx.centroids())).collect()
      .map(s => (s.query_id, s.neighbor_id, s.sim)).sortBy(t => (t._1, -t._3, t._2))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
    // superseded epochs GC; answers unchanged from the surviving epoch
    idx.gcOldEpochs()
    (0 to 1).foreach { j =>
      assert(!java.nio.file.Files.exists(
               java.nio.file.Paths.get(s"$rtDir/e$j")),
             s"superseded epoch e$j not GC'd")
    }
    val after = idx.topK(qids, k = 5, nProbe = 3).collect()
      .map(s => (s.query_id, s.neighbor_id, s.sim)).sortBy(t => (t._1, -t._3, t._2))
    assert(after.toSeq == got.toSeq)
  }

  test("IvfIndex.topK: postings scan is partition-pruned to probed cells; no vector rides a shuffle") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val dir = tmpDir("ivfidx-prune-")
    val idx = new IncrementalAnn.IvfIndex(spark, dir, nCells = 8, iters = 4)
    idx.append(corpus.filter(pmod(col("id"), lit(2)) === 0), "id", "vec")
    idx.append(corpus.filter(pmod(col("id"), lit(2)) === 1), "id", "vec")
    // AQE's QueryStageExec leaves hide scan nodes (and their metrics)
    // from a plain collect — run this plan-shape probe with AQE off;
    // the broadcast is an explicit hint, so the join shape is unchanged
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = idx.topK(Seq(0L, 1L), k = 3, nProbe = 1).toDF()
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      // the claim in PLANS.md: a candidate scan reads ~nProbe/nCells of
      // the postings files via the cell= layout. The query-vector-
      // resolution scan legitimately filters by id, not cell — so the
      // cell-filtered scans are exactly the candidate side (one per
      // appended round), and THEY must prune.
      val scans = plan.collect {
        case s: FileSourceScanExec
            if s.partitionFilters.exists(_.references.exists(_.name == "cell"))
          => s
      }
      assert(scans.size >= 2,
             s"expected a cell-filtered candidate scan per round, got ${scans.size}")
      // behavioral proof the filter PRUNED: the candidate scans together
      // read strictly fewer parquet files than exist under the cells
      // layout (2 queries x nProbe=1 probe at most 2 of the 8 cells)
      val onDisk = {
        val s = java.nio.file.Files.walk(
          java.nio.file.Paths.get(s"$dir/e0/cells"))
        try s.filter(p => p.getFileName.toString.endsWith(".parquet")).count()
        finally s.close()
      }
      val scanned = scans.map(_.metrics("numFiles").value).sum
      assert(scanned < onDisk,
             s"no pruning: scanned $scanned of $onDisk postings files")
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      exchanges.foreach { e =>
        val fat = e.output.filter(_.dataType == ArrayType(FloatType))
        assert(fat.isEmpty,
               s"IvfIndex.topK shuffles vectors: ${fat.map(_.name)}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("IvfIndex: slot-pinned append retry overwrites, never duplicates; pinning excludes retrain") {
    val dir = tmpDir("ivf-slotpin-")
    val idx = new IncrementalAnn.IvfIndex(spark, dir, nCells = 4, iters = 3,
                                          retrainEvery = 0)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r0 = e.filter(col("vec_id") % 2 === 0)
    val r1 = e.filter(col("vec_id") % 2 === 1)
    idx.append(r0, "vec_id", "embedding") // bootstrap
    assert(idx.append(r1, "vec_id", "embedding", slot = Some(1)) == (0, 1))
    val before = idx.rounds()
    // the at-least-once retry: same slice, same slot — must overwrite
    assert(idx.append(r1, "vec_id", "embedding", slot = Some(1)) == (0, 1))
    assert(idx.rounds() == before, s"retry changed slots: ${idx.rounds()}")
    // no duplicate ids anywhere in the epoch's postings
    val ids = idx.rounds().flatMap(k =>
      spark.read.parquet(s"$dir/e0/cells/r$k").select("id").as[Long].collect())
    assert(ids.size == ids.distinct.size, "duplicate ids after retry")
    // slot gaps fail loud; pinning with retrain enabled is rejected
    val gap = intercept[IllegalArgumentException] {
      idx.append(r1, "vec_id", "embedding", slot = Some(5))
    }
    assert(gap.getMessage.contains("requires committed rounds"))
    val idxRt = new IncrementalAnn.IvfIndex(spark, tmpDir("ivf-rt-"),
                                            nCells = 4, iters = 3,
                                            retrainEvery = 2)
    idxRt.append(r0, "vec_id", "embedding")
    val bad = intercept[IllegalArgumentException] {
      idxRt.append(r1, "vec_id", "embedding", slot = Some(1))
    }
    assert(bad.getMessage.contains("cannot combine with retrainEvery"))
  }

  test("IvfIndex: epoch-aware pins re-train in-line; a replay straddling the fold is applied-or-loud") {
    val dir = tmpDir("ivf-epochpin-")
    val idx = new IncrementalAnn.IvfIndex(spark, dir, nCells = 8, iters = 4,
                                          retrainEvery = 3)
    val rounds = (0 to 2).map(r => corpus.filter(pmod(col("id"), lit(3)) === r))
    def pinned(r: Int, e: Int, k: Int) =
      idx.append(rounds(r), "id", "vec", slot = Some(k), slotEpoch = Some(e))
    // pinned bootstrap may only claim (0, 0)
    assert(pinned(0, 0, 0) == (0, 0))
    assert(pinned(1, 0, 1) == (0, 1))
    // in-epoch pinned replay overwrites its own slot
    assert(pinned(1, 0, 1) == (0, 1) && idx.rounds() == Seq(0, 1))
    // the third pinned append trips retrainEvery=3: fold into epoch 1 —
    // the restriction the legacy pin declares is LIFTED by the epoch pin
    assert(pinned(2, 0, 2) == (1, 0))
    assert(idx.activeEpoch() == 1 && idx.rounds() == Seq(0))
    val foldedIds = spark.read.parquet(s"$dir/e1/cells/r0")
      .select("id").as[Long].collect().sorted
    // the at-least-once replay of the fold-triggering append: its slot
    // committed in the superseded epoch, so the fold already carries the
    // slice -> idempotent no-op reporting the fold's location
    assert(pinned(2, 0, 2) == (1, 0))
    assert(idx.activeEpoch() == 1 && idx.rounds() == Seq(0))
    val afterIds = spark.read.parquet(s"$dir/e1/cells/r0")
      .select("id").as[Long].collect().sorted
    assert(afterIds.sameElements(foldedIds), "no-op replay mutated the fold")
    assert(foldedIds.length == foldedIds.distinct.length,
           "duplicate ids after straddling replay")
    // answers stay batch-equal against the active epoch's centroids
    val qids = (0L until 5L).toSeq
    val got = idx.topK(qids, k = 5, nProbe = 3).collect()
      .map(s => (s.query_id, s.neighbor_id, s.sim)).sortBy(t => (t._1, -t._3, t._2))
    val want = Similarity.ivfTopK(spark, corpus, "id", "vec", qids, 5,
                                  nCells = 8, nProbe = 3,
                                  centroidsOpt = Some(idx.centroids())).collect()
      .map(s => (s.query_id, s.neighbor_id, s.sim)).sortBy(t => (t._1, -t._3, t._2))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
    // a pin whose slot never committed in its claimed epoch: loud reject
    val diverged = intercept[IllegalArgumentException] {
      idx.append(rounds(0), "id", "vec", slot = Some(5), slotEpoch = Some(0))
    }
    assert(diverged.getMessage.contains("straddles a completed re-train"))
    // a pinned replay against a WIPED index must fail the bootstrap gap
    // check, never silently re-bootstrap under a wrong slot mapping
    val wiped = new IncrementalAnn.IvfIndex(spark, tmpDir("ivf-wiped-"),
                                            nCells = 8, iters = 4)
    val boot = intercept[IllegalArgumentException] {
      wiped.append(rounds(0), "id", "vec", slot = Some(2), slotEpoch = Some(0))
    }
    assert(boot.getMessage.contains("bootstrap append"))
  }

  test("IvfIndex: an epoch without committed centroids is invisible; retry redoes it") {
    val dir = tmpDir("ivfidx-crash-")
    val idx = new IncrementalAnn.IvfIndex(spark, dir, nCells = 4, iters = 2)
    val half = corpus.filter(pmod(col("id"), lit(2)) === 0)
    idx.append(half, "id", "vec")
    // simulate a re-train that died after writing e1's postings but
    // before committing its centroids: e1 must be invisible
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/e1/cells/r0"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/e1/centroids/_temporary"))
    assert(idx.activeEpoch() == 0)
    val rest = corpus.filter(pmod(col("id"), lit(2)) === 1)
    val (e, r) = idx.append(rest, "id", "vec")
    assert((e, r) == (0, 1), s"append landed in ($e,$r)")
    val qids = (0L until 3L).toSeq
    val got = idx.topK(qids, k = 3, nProbe = 2).collect()
    assert(got.nonEmpty)
  }
}

class ConnectedComponentsSpec extends SparkSuite {
  import spark.implicits._
  import graft.ops.ConnectedComponents

  /** Sequential union-find oracle. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    val got = ConnectedComponents
      .components(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    val want = ufComponents(edges.filter(e => e._1 != e._2))
    assert(got == want, s"got=${got.toSeq.sorted} want=${want.toSeq.sorted}")
  }

  test("path graph (worst case for label propagation)") {
    check((0L until 63L).map(i => (i, i + 1)))
  }

  test("star, reversed star, disjoint cliques, duplicate + self edges") {
    check((1L to 20L).map(i => (0L, i)))
    check((1L to 20L).map(i => (i, 0L)))
    val cliques = for {
      c <- 0L until 5L; i <- 0L until 4L; j <- (i + 1) until 4L
    } yield (c * 100 + i, c * 100 + j)
    check(cliques)
    check(Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (7L, 7L)))
  }

  test("empty and self-loop-only edge sets yield no rows") {
    assert(ConnectedComponents.components(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0)
    assert(ConnectedComponents.components(
      Seq((5L, 5L)).toDF("id_a", "id_b")).count() == 0)
  }

  test("seeded random graphs match union-find") {
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { _ =>
      val n = 200
      val edges = (0 until 300).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      check(edges)
    }
  }

  test("clusters: size and canonical keep flag") {
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val got = ConnectedComponents.clusters(pairs)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set((10L, 10L, 3L, true), (11L, 10L, 3L, false),
                      (12L, 10L, 3L, false), (20L, 20L, 2L, true),
                      (21L, 20L, 2L, false)))
  }
}

class TrainingDataOpsSpec extends SparkSuite {
  import spark.implicits._
  import graft.ops.{Packing, Sampling, TextOps}

  test("stratifiedSample: deterministic, rate-faithful, stratum-scoped") {
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("id", "lang")
    val rates = Map("en" -> 1.0, "zh" -> 0.0)
    val kept = Sampling.stratifiedSample(df, "lang", "id", rates, 0.5, "s1")
    val ids = kept.select("id").as[Long].collect().toSet
    assert(ids == (0L until 1000L by 2).toSet) // all en, no zh
    // determinism: bit-identical on a re-run
    val again = Sampling.stratifiedSample(df, "lang", "id", rates, 0.5, "s1")
      .select("id").as[Long].collect().toSet
    assert(again == ids)
    // default rate applies to strata missing from the map, ~50%
    val dfDe = (0L until 1000L).map(i => (i, "de")).toDF("id", "lang")
    val nDe = Sampling.stratifiedSample(dfDe, "lang", "id", rates, 0.5, "s1").count()
    assert(nDe > 350 && nDe < 650, s"default-rate sample size $nDe")
    // a different seed draws a different sample
    val other = Sampling.stratifiedSample(dfDe, "lang", "id", rates, 0.5, "s2")
      .select("id").as[Long].collect().toSet
    val first = Sampling.stratifiedSample(dfDe, "lang", "id", rates, 0.5, "s1")
      .select("id").as[Long].collect().toSet
    assert(other != first)
  }

  test("tokenPack: contiguous shards by start offset, per-group") {
    val df = Seq(
      ("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L), ("a", 4L, 12L),
      ("b", 1L, 9L), ("b", 2L, 2L)
    ).toDF("src", "doc", "toks")
    val got = Packing.tokenPack(df, "src", "doc", "toks", 10L)
      .select("src", "doc", "shard").as[(String, Long, Long)]
      .collect().toSet
    // group a offsets: 0,5,10,15 -> shards 0,0,1,1; group b: 0,9 -> 0,0
    assert(got == Set(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L),
                      ("a", 4L, 1L), ("b", 1L, 0L), ("b", 2L, 0L)))
  }

  test("redact_pii and counts") {
    val df = Seq(
      "mail a.b+c@x.example.org now",
      "call +44-201-3344 or +1-555-0042",
      "no pii here",
      "two a@b.co c@d.org emails").toDF("t")
    val got = df.select(TextOps.redact_pii(col("t")),
                        TextOps.pii_email_count(col("t")),
                        TextOps.pii_phone_count(col("t")))
      .as[(String, Int, Int)].collect().toSeq
    assert(got == Seq(
      ("mail <EMAIL> now", 1, 0),
      ("call <PHONE> or <PHONE>", 0, 2),
      ("no pii here", 0, 0),
      ("two <EMAIL> <EMAIL> emails", 2, 0)))
  }

  test("dup_ngram_fraction: repetition signal") {
    val df = Seq(
      "a b a b",           // 2-grams: ab,ba,ab -> 1 - 2/3 = 0.3333
      "w x y z",           // all distinct -> 0.0
      "one",               // < 2 words -> 0.0
      "go go go go go"     // 2-grams all "go go" -> 1 - 1/4 = 0.75
    ).toDF("t")
    val got = df.select(TextOps.dup_ngram_fraction(col("t"), 2))
      .as[Double].collect().toSeq
    assert(got == Seq(0.3333, 0.0, 0.0, 0.75))
  }
}

class ComposeOpsSpec extends SparkSuite {
  import spark.implicits._
  import graft.ops.{Chunking, Decontaminate, GlobalIndex}

  test("decontaminate: exact distinct-gram overlap counts, clean rows explicit") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),       // shares "alpha beta" with bench
      (2L, "gamma delta epsilon zeta"),     // shares "gamma delta"
      (3L, "totally unrelated words here"), // clean
      (4L, "alpha beta alpha beta gamma")   // repeated phrase: grams distinct
    ).toDF("id", "text")
    val bench = Seq("alpha beta gamma", "x gamma delta y").toDF("text")
    val got = Decontaminate.overlap(corpus, bench, "id", "text", n = 2)
      .orderBy("id").as[(Long, Long, Boolean)].collect().toSeq
    // bench 2-grams: {alpha beta, beta gamma, x gamma, gamma delta, delta y}
    // doc1 grams {alpha beta, beta gamma, gamma delta} -> 3 hits
    // doc2 grams {gamma delta, delta epsilon, epsilon zeta} -> 1 hit
    // doc4 grams {alpha beta, beta alpha, beta gamma} -> 2 hits (no dup count)
    assert(got == Seq((1L, 3L, true), (2L, 1L, true), (3L, 0L, false),
                      (4L, 2L, true)))
  }

  test("decontaminate: n larger than every doc flags nothing") {
    val corpus = Seq((1L, "a b c")).toDF("id", "text")
    val bench = Seq("a b c").toDF("text")
    val got = Decontaminate.overlap(corpus, bench, "id", "text", n = 9)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, 0L, false)))
  }

  test("slidingChunks: boundaries, tail chunk, overlap, empty doc") {
    val docs = Seq(
      (1L, (1 to 20).map(i => s"w$i").mkString(" ")), // 20 words
      (2L, "a b c"),                                   // <= chunkSize: 1 chunk
      (3L, "")                                         // empty: no rows
    ).toDF("id", "text")
    val got = Chunking.slidingChunks(docs, "id", "text", chunkSize = 8, stride = 5)
      .orderBy("id", "chunk_idx")
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc1: starts 0,5,10,15 -> chunks of 8,8,8,5 words; formula:
    // 1 + ceil((20-8)/5) = 1+3 = 4 chunks
    val w = (1 to 20).map(i => s"w$i")
    val expect1 = Seq(0, 5, 10, 15).zipWithIndex.map { case (st, ci) =>
      val c = w.slice(st, st + 8)
      (1L, ci.toLong, c.length.toLong, c.mkString(" "))
    }
    assert(got.filter(_._1 == 1L) == expect1)
    assert(got.filter(_._1 == 2L) == Seq((2L, 0L, 3L, "a b c")))
    assert(!got.exists(_._1 == 3L))
    // every word position is covered by at least one chunk
    val covered = got.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(covered == w.toSet)
  }

  test("slidingChunks: stride == chunkSize gives a disjoint partition") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    val got = Chunking.slidingChunks(docs, "id", "text", 4, 4)
      .orderBy("chunk_idx").as[(Long, Long, Long, String)].collect().toSeq
    assert(got.map(_._4) == Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10"))
    assert(got.map(_._3) == Seq(4L, 4L, 2L))
  }

  test("globalRowNumber: consecutive, total-order-faithful, deterministic") {
    val df = (0L until 997L).map(i => (i, (i * 7919) % 101)).toDF("id", "key")
    val sorted = GlobalIndex.globalRowNumber(
      df, Seq(col("key").desc, col("id")), numPartitions = 7)
    val got = sorted.select("id", "key", "global_idx")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(got.map(_._3).toSeq == (0L until 997L).toSeq) // consecutive from 0
    val oracle = df.as[(Long, Long)].collect()
      .sortBy { case (id, k) => (-k, id) }.map(_._1).toSeq
    assert(got.map(_._1).toSeq == oracle) // exact total order
    // deterministic across runs (key-complete sort)
    val again = GlobalIndex.globalRowNumber(
      df, Seq(col("key").desc, col("id")), numPartitions = 7)
      .select("id", "global_idx").as[(Long, Long)].collect().sortBy(_._2)
    assert(again.map(_._1).toSeq == got.map(_._1).toSeq)
  }


  test("fixed-point PageRank: bit-exact vs an independent sequential run; hubs rank highest") {
    import graft.ops.PageRank
    // star graph: 1..8 <-> 0 (both directions, no dangling nodes)
    val star = (1L to 8L).flatMap(i => Seq((i, 0L), (0L, i))).toDF("src", "dst")
    val got = PageRank.ranks(star, 10).as[(Long, Long)].collect().toMap
    // independent sequential recomputation (same integer algebra)
    def seqRanks(edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val n = nodes.size.toLong
      val outDeg = edges.toSeq.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      var rank = nodes.map(_ -> PageRank.scale / n).toMap
      val base = (PageRank.scale * 15L / 100L) / n
      (1 to iters).foreach { _ =>
        val sums = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        edges.foreach { case (s, d) => sums(d) += rank(s) / outDeg(s) }
        rank = nodes.map(nd => nd -> (base + sums(nd) * 85L / 100L)).toMap
      }
      rank
    }
    val want = seqRanks((1L to 8L).flatMap(i => Seq((i, 0L), (0L, i))).toSet, 10)
    assert(got == want, s"spark $got != seq $want")
    // the hub dominates every spoke, spokes are symmetric
    assert((1L to 8L).forall(i => got(0L) > got(i)))
    assert((1L to 8L).map(got).toSet.size == 1)
    // random graph: equality must hold at a different parallelism too
    val rnd = new scala.util.Random(7)
    val edges = (0 until 400).map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).toSet
    val df = edges.toSeq.toDF("src", "dst").repartition(7)
    val g2 = PageRank.ranks(df, 10).as[(Long, Long)].collect().toMap
    assert(g2 == seqRanks(edges, 10))
    // conservation sanity: total rank stays within floor-drift of scale
    val total = g2.values.sum
    assert(total <= PageRank.scale && total > PageRank.scale * 97 / 100,
           s"mass off: $total")
  }

  test("decontaminate property: flagged iff a pure-Scala oracle finds shared n-grams") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small vocab forces real collisions; oracle recomputes overlap
    // with plain Scala sets, fully independent of the Spark operator
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val doc = Gen.choose(0, 9).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    def grams(t: String, n: Int): Set[String] = {
      val ws = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      if (ws.length < n) Set.empty
      else ws.sliding(n).map(_.mkString(" ")).toSet
    }
    (0 until 8).foreach { trial =>
      val p = Gen.Parameters.default
      val corpusDocs = (0 until 12).map(i =>
        (i.toLong, doc.pureApply(p, Seed(trial * 1000L + i))))
      val benchDocs = (0 until 3).map(i =>
        doc.pureApply(p, Seed(trial * 1000L + 500 + i)))
      val benchGrams = benchDocs.flatMap(grams(_, 2)).toSet
      val expect = corpusDocs.map { case (id, t) =>
        (id, grams(t, 2).count(benchGrams.contains).toLong)
      }.toMap
      val got = Decontaminate.overlap(
          corpusDocs.toDF("id", "text"), benchDocs.toDF("text"), "id", "text", 2)
        .as[(Long, Long, Boolean)].collect()
      got.foreach { case (id, n, flag) =>
        assert(n == expect(id) && flag == (n > 0),
               s"trial $trial id $id: got ($n,$flag) want ${expect(id)}")
      }
    }
  }

  test("slidingChunks property: coverage, count formula, reassembly") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val lens = (0 until 40).map(i =>
      Gen.choose(0, 60).pureApply(Gen.Parameters.default, Seed(i.toLong)))
    val docs = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(j => s"w${i}x$j").mkString(" "))
    }
    val (c, s) = (7, 4)
    val got = Chunking.slidingChunks(docs.toDF("id", "text"), "id", "text", c, s)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    docs.foreach { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      val expectChunks =
        if (ws.isEmpty) 0 else if (ws.length <= c) 1
        else 1 + math.ceil((ws.length - c).toDouble / s).toInt
      val chunks = got.getOrElse(id, Array.empty)
      assert(chunks.length == expectChunks, s"doc $id: ${chunks.length} chunks")
      chunks.zipWithIndex.foreach { case ((_, ci, nt, ct), k) =>
        assert(ci == k) // contiguous chunk_idx from 0
        val expect = ws.slice(k * s, k * s + c)
        assert(ct == expect.mkString(" ") && nt == expect.length,
               s"doc $id chunk $k")
      }
      // coverage: every word position in >= 1 chunk (stride <= size)
      if (ws.nonEmpty)
        assert(chunks.flatMap(_._4.split(" ")).toSet == ws.toSet)
    }
  }

  test("globalRowNumber: more partitions than rows still numbers 0..n-1") {
    val df = Seq((5L, 1L), (3L, 2L), (9L, 0L)).toDF("id", "key")
    val got = GlobalIndex.globalRowNumber(df, Seq(col("key")), 8)
      .select("id", "global_idx").as[(Long, Long)].collect().sortBy(_._2)
    assert(got.toSeq == Seq((9L, 0L), (5L, 1L), (3L, 2L)))
  }
}
