package graft

import org.apache.spark.sql.functions._

import graft.operators.{BandJoin, Dedup, Multimodal, TextAnalysis, VectorOps}

/** Extension-operator semantics: dedup family, vector similarity, text
  * analysis, multimodal plumbing, bucketed band join.
  */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank now"), // near-dup of 1
    (3L, "spark executes distributed queries with catalyst optimizer and tungsten engine"),
    (4L, "completely different content about databases and storage engines here"),
    (5L, "the quick brown fox jumps over the lazy dog near the river bank today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup keeps one representative per key with dup counts") {
    val out = Dedup.exact(docs, Seq("text"), "doc_id")
    assert(out.count() == 4)
    assert(out.filter($"dup_count" === 2).select($"keeper").head().getLong(0) == 1L)
  }

  test("span dedup: cross-doc boilerplate drops, first occurrence wins, alignment matters, every doc survives") {
    // W=3 spans. Doc 11 and 12 share an identical leading 6 tokens (two
    // aligned spans of boilerplate); doc 13 carries the SAME tokens
    // shifted by one position (mis-aligned spans — must NOT dedup);
    // doc 14 is a verbatim copy of doc 11 (fully duplicated).
    val corpus = Seq(
      (11L, "copy right header text follows here unique eleven tail words"),
      (12L, "copy right header text follows here twelve has different ending"),
      (13L, "x copy right header text follows here thirteen shifted body"),
      (14L, "copy right header text follows here unique eleven tail words")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(corpus, "doc_id", "text", spanTokens = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(11L, 12L, 13L, 14L), "every input doc must come back")
    // doc 11 keeps everything (it is first for all its spans)
    assert(out(11L) == (("copy right header text follows here unique eleven tail words", 4L, 4L)))
    // doc 12 loses its two boilerplate spans, keeps its own suffix
    assert(out(12L) == (("twelve has different ending", 4L, 2L)))
    // doc 13's shifted copies chunk differently — nothing drops
    assert(out(13L)._3 == 4L, s"mis-aligned spans must not dedup: ${out(13L)}")
    // doc 14 is fully duplicated: survives the output, empty and countable
    assert(out(14L) == (("", 4L, 0L)))
  }

  test("minhash LSH finds the near-dup and exact-dup pairs, not unrelated docs") {
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text", numHashes = 32, bands = 8, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((1L, 5L))) // exact dup: est_jaccard = 1.0
    assert(pairs.find(p => (p._1, p._2) == ((1L, 5L))).get._3 == 1.0)
    assert(ids.contains((1L, 2L)) || ids.contains((2L, 5L))) // near dup collides
    assert(!ids.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical docs at distance 0; near-dups closer than unrelated docs") {
    val pairs = Dedup.simHashDedup(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((1L, 5L)) == 0) // exact dup guaranteed by pigeonhole at d<=3
    // hash-level property (bucketing guarantees only d<=3): near-dup pair is
    // strictly closer in Hamming space than unrelated pairs
    val hashes = docs.select($"doc_id", Dedup.simHash($"text").as("sh")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
    assert(ham(1L, 2L) < ham(1L, 4L))
    assert(ham(1L, 2L) < ham(1L, 3L))
    // the codegen agg path must produce identical hashes to the column fold
    val aggHashes = Dedup.simHashDf(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aggHashes == hashes)
  }

  test("ngram jaccard computes exact overlap ratio") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", k = 3, minJaccard = 0.3, maxDocFreq = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 5L)) == 1.0)
    // docs 1 and 2: 14 tokens → 12 shingles each, 11 shared:
    // J = 11 / (12 + 12 - 11) = 11/13
    assert(math.abs(pairs((1L, 2L)) - 11.0 / 13.0) < 1e-9)
  }

  test("VecDot codegen expression is bit-identical to the HOF fold and type-checks") {
    graft.expressions.GraftFunctions.register(spark)
    val df = (0L until 200L).map(i => (i, Array.tabulate(64)(d => math.sin(i * 7.0 + d)),
      Array.tabulate(64)(d => math.cos(i * 3.0 + d)))).toDF("id", "a", "b")
    val both = df.select(
      VectorOps.dot($"a", $"b").as("fold"),
      call_function("vec_dot", $"a", $"b").as("codegen")).collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // bitwise equal
    // type error surfaces cleanly at analysis
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("vec_dot", $"id", $"a")).collect()
    }
    assert(err.getMessage.contains("vec_dot") || err.getMessage.toLowerCase.contains("data type"))
  }

  test("cosine and brute-force top-k match hand computation") {
    val corpus = Seq(
      (10L, Array(1.0, 0.0, 0.0)),
      (11L, Array(0.9, 0.1, 0.0)),
      (12L, Array(0.0, 1.0, 0.0)),
      (13L, Array(-1.0, 0.0, 0.0))).toDF("id", "vec")
    val queries = Seq((1L, Array(1.0, 0.0, 0.0))).toDF("qid", "qvec")
    val top = VectorOps.cosineTopK(corpus, queries, 2).collect()
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(10L, 11L))
    assert(math.abs(top.head.getAs[Double]("cosine") - 1.0) < 1e-12)
    val expected11 = 0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1)
    assert(math.abs(top(1).getAs[Double]("cosine") - expected11) < 1e-12)
  }

  test("embedding near-dup via LSH recovers planted duplicates") {
    val base = (0L until 50L).map { i =>
      (i, Array.tabulate(16)(d => math.sin(i * 17.0 + d * 3.0)))
    }
    val planted = base.take(5).map { case (i, v) => (i + 1000L, v.map(_ + 0.001)) }
    val df = (base ++ planted).toDF("id", "vec")
    val pairs = VectorOps.embeddingNearDup(df, "id", "vec", threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach(i => assert(pairs.contains((i, i + 1000L)), s"missing planted pair $i"))
  }

  test("LSH top-k achieves decent recall vs brute force on clustered data") {
    val corpus = (0L until 200L).map { i =>
      val center = (i % 4).toDouble
      (i, Array.tabulate(16)(d => center + 0.1 * math.sin(i * 13.0 + d)))
    }.toDF("id", "vec")
    val queries = (0L until 4L).map { q =>
      (q, Array.tabulate(16)(d => q.toDouble + 0.1 * math.cos(q * 7.0 + d)))
    }.toDF("qid", "qvec")
    val exact = VectorOps.cosineTopK(corpus, queries, 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = VectorOps.cosineLshTopK(corpus, queries, 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("langId: CJK charset wins zh; English markers win en") {
    val out = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "机器学习模型训练数据处理系统")).toDF("doc_id", "text")
      .withColumn("lid", TextAnalysis.langId($"text"))
      .select($"doc_id", $"lid.predicted_lang".as("p")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "zh")
  }

  test("token counts: whitespace, regex and BPE estimate") {
    val r = TextAnalysis.tokenCounts(Seq((1L, "Hello world, 42 tests!")).toDF("doc_id", "text")).head()
    assert(r.getAs[Int]("ws_tokens") == 4)
    // [Hello][world][,][4][2][tests][!] = 7
    assert(r.getAs[Int]("regex_tokens") == 7)
    assert(r.getAs[Long]("bpe_est_tokens") == math.ceil(22 / 4.0).toLong)
  }

  test("winnowing fingerprints: identical docs share all, different docs share none") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "totally unrelated text with zero ngram overlap whatsoever")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprintDocs(df, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[scala.collection.Seq[Long]]("fingerprints").toSet).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L).intersect(fp(3L)).isEmpty)
  }

  test("quality features: clean text scores high, degenerate text scores low, always in [0,1]") {
    val out = TextAnalysis.qualityFeatures(Seq(
      (1L, "this is a perfectly reasonable sentence with normal words and structure"),
      (2L, "a a a a a a a a a a a a a a a a a a a a"),
      (3L, "x")).toDF("doc_id", "text"))
      .select($"doc_id", $"quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0)
    assert(out(2L) < 0.5)
    assert(out(3L) < 1.0)
    out.values.foreach(s => assert(s >= 0.0 && s <= 1.0))
  }

  test("multimodal: feature extraction is deterministic, schema intact; frame sampling expands video") {
    val corpus = Multimodal.syntheticCorpus(spark, 30)
    val f1 = Multimodal.extractFeatures(corpus).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(corpus).collect().sortBy(_.media_id)
    assert(f1.map(_.payload_hash).toSeq == f2.map(_.payload_hash).toSeq)
    assert(f1.forall(_.feature.length == 16))
    val frames = Multimodal.frameSample(corpus, everyMs = 500)
    assert(frames.count() > 10)
    assert(frames.columns.contains("frame_ts_ms"))
    val resized = Multimodal.resize(corpus, 32, 32).filter(r => r.meta.media_type == "image").head()
    assert(resized.meta.width == 32 && resized.meta.height == 32)
  }

  test("multimodal: images REALLY decode — dims match metadata, features track pixels, resize re-renders") {
    val corpus = Multimodal.syntheticCorpus(spark, 48)
    val metaById = corpus.collect().map(r => r.media_id -> r.meta).toMap
    val imgFeats = Multimodal.extractFeatures(corpus).collect()
      .filter(_.media_type == "image").sortBy(_.media_id)
    assert(imgFeats.nonEmpty)
    imgFeats.foreach { f =>
      val m = metaById(f.media_id)
      // decoded width/height (features 0/1 come from the decoded pixels,
      // not the metadata) must equal the declared metadata
      assert(f.feature(0) == m.width.toFloat && f.feature(1) == m.height.toFloat,
        s"media ${f.media_id}: decoded ${f.feature(0)}x${f.feature(1)} vs meta ${m.width}x${m.height}")
      // luminance histogram fractions sum to 1 over the 8 bins
      val histSum = (5 until 13).map(f.feature(_)).sum
      assert(math.abs(histSum - 1.0f) < 1e-3f)
      // mean RGB within byte range
      (2 until 5).foreach(i => assert(f.feature(i) >= 0f && f.feature(i) <= 255f))
    }
    // same declared dims (id % 8 equal), different ids → different pixels
    // → the pixel-derived features must differ beyond the dim slots
    val byId = imgFeats.map(f => f.media_id -> f.feature).toMap
    val (a, b) = (byId(0L), byId(24L))
    assert(a.toSeq.take(2) == b.toSeq.take(2) && a.toSeq != b.toSeq,
      "pixel change must change features even at identical dimensions")
    // resize really re-renders: decoding the resized payload yields 32x32
    val resizedFeats = Multimodal.extractFeatures(Multimodal.resize(corpus, 32, 32))
      .collect().filter(_.media_type == "image")
    assert(resizedFeats.forall(f => f.feature(0) == 32f && f.feature(1) == 32f))
    // and the resized payload is a genuinely different encoded image
    assert(resizedFeats.map(_.payload_hash).toSet
      .intersect(imgFeats.map(_.payload_hash).toSet).isEmpty)
  }

  test("multimodal: audio REALLY decodes — WAV parses, features are sample-derived") {
    val corpus = Multimodal.syntheticCorpus(spark, 63)
    val metaById = corpus.collect().map(r => r.media_id -> r.meta).toMap
    val audio = Multimodal.extractFeatures(corpus).collect()
      .filter(_.media_type == "audio").sortBy(_.media_id)
    assert(audio.nonEmpty)
    audio.foreach { f =>
      val m = metaById(f.media_id)
      // parsed sample rate / channels from the RIFF header, duration from
      // the REAL frame count — all must reconcile with the metadata
      assert(f.feature(0) == m.sample_rate.toFloat, s"media ${f.media_id}: sample rate")
      assert(f.feature(1) == 1f)
      assert(math.abs(f.feature(2) - m.duration_ms) < 1.0f,
        s"media ${f.media_id}: decoded duration ${f.feature(2)} vs meta ${m.duration_ms}")
      // RMS of the 0.6+0.25 two-tone mix ≈ √(0.6²/2+0.25²/2) ≈ 0.46
      assert(f.feature(3) > 0.3f && f.feature(3) < 0.6f, s"RMS ${f.feature(3)}")
      assert(f.feature(4) > 0f, "zero-crossing rate")
      val histSum = (5 until 13).map(f.feature(_)).sum
      assert(math.abs(histSum - 1.0f) < 1e-3f)
      assert(f.feature(13) > 0.5f && f.feature(13) <= 1.0f, "peak amplitude")
    }
    // different samples (different fundamental freq) ⇒ different features
    // even at identical duration: ids 1 and 31 share id%10, differ in id%40
    val byId = audio.map(f => f.media_id -> f.feature).toMap
    val (a, b) = (byId(1L), byId(31L))
    assert(a(2) == b(2), "same declared duration")
    assert(a.toSeq != b.toSeq, "sample change must change features")
    assert(a(4) < b(4), "higher fundamental frequency must raise the zero-crossing rate")
  }

  test("multimodal: video REALLY demuxes and decodes — frame-derived dims/duration/motion, real frame bytes") {
    val corpus = Multimodal.syntheticCorpus(spark, 30)
    val metaById = corpus.collect().map(r => r.media_id -> r.meta).toMap
    val vids = Multimodal.extractFeatures(corpus).collect()
      .filter(_.media_type == "video").sortBy(_.media_id)
    assert(vids.nonEmpty)
    vids.foreach { f =>
      val m = metaById(f.media_id)
      // dims come from the DECODED first frame, duration from the REAL
      // demuxed frame count — both must reconcile with the metadata
      assert(f.feature(0) == m.width.toFloat && f.feature(1) == m.height.toFloat,
        s"media ${f.media_id}: decoded ${f.feature(0)}x${f.feature(1)} vs meta ${m.width}x${m.height}")
      assert(f.feature(4) == m.duration_ms.toFloat,
        s"media ${f.media_id}: decoded duration ${f.feature(4)} vs meta ${m.duration_ms}")
      assert(f.feature(3) == 2.0f, "fps = 1000 / 500ms frames")
      // consecutive frames are translated patterns — real pixel motion
      if (f.feature(2) > 1) assert(f.feature(6) > 0f, s"media ${f.media_id}: zero motion")
      assert(f.feature(5) > 0f && f.feature(5) < 255f, "mean luma in byte range")
    }
    // frame sampling emits the frames' ACTUAL PNG bytes: every sampled
    // frame decodes to the video's declared dimensions
    val frames = Multimodal.frameSample(corpus, everyMs = 500)
      .select("media_id", "frame_idx", "frame_bytes").collect()
    assert(frames.nonEmpty)
    frames.take(20).foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("frame_bytes")))
      assert(img != null, "sampled frame must be a decodable PNG")
      val m = metaById(r.getLong(0))
      assert(img.getWidth == m.width && img.getHeight == m.height)
    }
    // stride honors everyMs: sampling at 2× the frame interval halves rows
    val dense = Multimodal.frameSample(corpus, everyMs = 500).count()
    val sparse = Multimodal.frameSample(corpus, everyMs = 1000).count()
    assert(sparse < dense && sparse > 0)
    // stride ROUNDS to the nearest frame: 750ms against 500ms frames is
    // step 2 (like 1000ms), not the every-frame over-sampling integer
    // division would give
    assert(Multimodal.frameSample(corpus, everyMs = 750).count() == sparse)
  }

  test("multimodal near-dup: perturbed re-encoded PNG copies group with their source, distinct images don't collapse") {
    val base = Multimodal.syntheticCorpus(spark, 90)
    val copies = Multimodal.perturbImages(base, delta = 2)
    assert(copies.count() == base.filter(r => r.meta.media_type == "image").count())
    // the copies are byte-distinct (exact dedup is blind to them)...
    val baseHashes = base.collect().map(r => java.util.Arrays.hashCode(r.payload)).toSet
    assert(copies.collect().forall(r => !baseHashes.contains(java.util.Arrays.hashCode(r.payload))))
    // ...but feature-space near-dup must resolve source+copy into one group
    val groups = Multimodal.nearDupGroups(base.unionAll(copies))
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("group")).toMap
    val imageIds = base.collect().filter(_.meta.media_type == "image").map(_.media_id)
    imageIds.foreach { id =>
      assert(groups(id) == groups(id + 1000000L),
        s"planted copy of image $id must share its source's group")
    }
    // discrimination: must not collapse into one mega-group. (The
    // synthetic patterns are TRANSLATIONS of each other within a size
    // class, and translation preserves mean/histogram features — so
    // same-size pattern pairs legitimately co-group in this feature
    // space; 90-item corpus → 15 groups of source+phase-twin+copies.)
    assert(imageIds.map(groups).toSet.size >= imageIds.length / 2,
      "distinct images collapsed into too few groups")
    // audio: the pin is against TOTAL collapse (the rms-domination
    // failure mode where every same-rate clip cosined to ~1), not
    // per-tone discrimination — a sine's amplitude histogram is
    // frequency-independent, so clips with ADJACENT fundamentals
    // legitimately co-group and only the zero-crossing dim separates
    // the rest
    val audioIds = base.collect().filter(_.meta.media_type == "audio").map(_.media_id)
    assert(audioIds.map(groups).toSet.size > audioIds.length / 4,
      "audio collapsed toward one group — amplitude dims leaked into the similarity vector?")
    // video items co-group only within a size class (the block key):
    // groups never span different decoded dimensions
    val vids = base.collect().filter(_.meta.media_type == "video")
    val dimsById = vids.map(v => v.media_id -> ((v.meta.width, v.meta.height))).toMap
    vids.groupBy(v => groups(v.media_id)).values.foreach { members =>
      assert(members.map(v => dimsById(v.media_id)).toSet.size == 1,
        "a near-dup group spans different video dimensions")
    }
  }

  test("weighted sampling: 0 keeps nothing, 1 keeps all, monotone in weight, realized rate tracks the weight") {
    import graft.operators.Sampling
    val rows = (0L until 4000L).map(i => (i, 0.3)).toDF("id", "w")
    assert(Sampling.weightedSample(rows.withColumn("w", lit(0.0)), "id", col("w")).count() == 0)
    assert(Sampling.weightedSample(rows.withColumn("w", lit(1.0)), "id", col("w")).count() == 4000)
    // realized acceptance tracks the weight (hash-uniform draw)
    val k3 = Sampling.weightedSample(rows, "id", col("w")).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(math.abs(k3.size / 4000.0 - 0.3) < 0.05, s"rate ${k3.size / 4000.0}")
    // monotone: raising every weight only ADDS rows (same ids survive) —
    // the property that makes re-weighting safe mid-pipeline
    val k6 = Sampling.weightedSample(rows.withColumn("w", lit(0.6)), "id", col("w"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(k3.subsetOf(k6), "weight increase must never evict a kept row")
    // portable and native paths both respect the contract; out-of-range
    // weights clamp instead of throwing
    val p = Sampling.weightedSample(rows.withColumn("w", lit(2.5)), "id", col("w"),
      portable = true)
    assert(p.count() == 4000)
  }

  test("stride chunking: every token covered, overlap equals max-stride, short tail chunks kept") {
    import graft.operators.Packing
    val doc = (1 to 25).map(i => s"t$i").mkString(" ")
    val out = Packing.chunkWithStride(Seq((1L, doc)).toDF("doc_id", "text"),
        "doc_id", "text", maxTokens = 10, stride = 5)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getLong(3)))
    assert(out.length == 5, s"25 tokens at stride 5 -> 5 chunks, got ${out.length}")
    assert(out(0)._2 == (1 to 10).map(i => s"t$i").mkString(" "))
    assert(out(1)._2 == (6 to 15).map(i => s"t$i").mkString(" "), "stride-5 overlap of 5 tokens")
    assert(out(4) == ((4, (21 to 25).map(i => s"t$i").mkString(" "), 5L)), "short tail kept")
    assert(out.map(_._3).sum == 10 + 10 + 10 + 10 + 5)
    // every token appears in at least one chunk
    val covered = out.flatMap(_._2.split(" ")).toSet
    assert(covered == (1 to 25).map(i => s"t$i").toSet)
    // an empty-ish doc yields nothing rather than a degenerate chunk
    assert(Packing.chunkWithStride(Seq((2L, "solo")).toDF("doc_id", "text"),
      "doc_id", "text", 10, 5).count() == 1)
  }

  test("JL projection: deterministic, distance-preserving, and planted near-dups stay projected-space top-1") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val proj = VectorOps.jlProject(emb, "vec", "proj", k = 32, dims = 64)
    // deterministic: two runs produce identical arrays
    val a = proj.orderBy("vec_id").collect().map(_.getSeq[Double](2))
    val b = VectorOps.jlProject(emb, "vec", "proj", k = 32, dims = 64)
      .orderBy("vec_id").collect().map(_.getSeq[Double](2))
    assert(a.zip(b).forall { case (x, y) => x == y })
    // norms preserved in expectation: mean ratio of squared norms near 1
    val ratios = proj.select(
        (VectorOps.dot(col("proj"), col("proj")) /
          VectorOps.dot(col("vec"), col("vec"))).as("r"))
      .collect().map(_.getDouble(0))
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.2, s"mean squared-norm ratio $mean")
    // JL's actual contract — PAIRWISE DISTANCE preservation (not rank
    // preservation, which no projection guarantees when the corpus'
    // neighbor gaps are smaller than ε): squared-distance ratios for
    // sampled pairs concentrate around 1
    val pairs = proj.limit(40).select(col("vec_id"), col("vec"), col("proj"))
      .collect()
    val ratios2 = for {
      i <- pairs.indices; jj <- (i + 1) until pairs.length
      dv = pairs(i).getSeq[Double](1).zip(pairs(jj).getSeq[Double](1)).map { case (x, y) => x - y }
      dp = pairs(i).getSeq[Double](2).zip(pairs(jj).getSeq[Double](2)).map { case (x, y) => x - y }
    } yield dp.map(x => x * x).sum / dv.map(x => x * x).sum
    val m2 = ratios2.sum / ratios2.length
    assert(m2 > 0.75 && m2 < 1.25, s"mean pairwise sq-dist ratio $m2")
    assert(ratios2.count(r => r > 0.4 && r < 1.8).toDouble / ratios2.length >= 0.9,
      "≥90% of pairwise sq-dist ratios within [0.4, 1.8] at k=32")
    // the property a dedup pipeline needs: a planted near-duplicate
    // (cosine ≈ 0.9997) stays the projected-space TOP-1 neighbor
    val planted = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("vec"), x => x + lit(0.01)).as("vec"))
    val corpus = emb.filter(col("vec_id") >= 5).unionByName(planted)
      .select(col("vec_id").as("id"), col("vec"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
    val pq = VectorOps.jlProject(queries, "qvec", "qproj", k = 32, dims = 64)
      .select(col("qid"), col("qproj").as("qvec"))
    val pc = VectorOps.jlProject(corpus, "vec", "proj", k = 32, dims = 64)
      .select(col("id"), col("proj").as("vec"))
    val top1 = VectorOps.cosineTopK(pc, pq, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 5L).forall(q => top1(q) == q + 100000),
      s"planted near-dups must stay projected-space top-1: $top1")
  }

  test("bucketed band join ≡ naive band left join (scale-path rewrite correctness)") {
    val left = (1L to 60L).map { i =>
      (i, s"K${i % 7}", java.sql.Date.valueOf(java.time.LocalDate.parse("2026-01-01").plusDays(i * 3 % 50)))
    }.toDF("lid", "key", "ldate")
    val right = (1L to 40L).map { j =>
      (s"R$j", s"K${j % 7}", java.sql.Date.valueOf(java.time.LocalDate.parse("2026-01-01").plusDays(j * 5 % 50)))
    }.toDF("rid", "key", "rdate")

    val naive = left.join(right,
      left("key") === right("key") && abs(datediff($"ldate", $"rdate")) <= 7, "left")
      .select($"lid", $"rid").collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val bucketed = BandJoin.bandedLeftJoinById(left, right, "lid", "key", "ldate", "rdate", 7)
      .select($"lid", $"rid").collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(bucketed == naive)

    // auto toggle: measured fan-out statistics are exact, and the chosen
    // plan (naive here — tiny input) still matches
    val (naivePairs, bucketedPairs) =
      BandJoin.pairCounts(left, right, "key", "ldate", "rdate", 7)
    val expectedNaive = left.groupBy("key").count().withColumnRenamed("count", "m")
      .join(right.groupBy("key").count().withColumnRenamed("count", "n"), "key")
      .agg(sum($"m" * $"n")).head().getLong(0)
    assert(naivePairs == expectedNaive)
    assert(bucketedPairs <= naivePairs)
    val auto = BandJoin.autoBandedLeftJoin(left, right, "lid", "key", "ldate", "rdate", 7)
      .select($"lid", $"rid").collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(auto == naive)

    // hot key + wide date spread: bucketing wins by the measured ratio,
    // auto picks the rewrite (forced via minPairs=0) and stays correct
    val hotLeft = (1L to 300L).map { i =>
      (i, "HOT", java.sql.Date.valueOf(java.time.LocalDate.parse("2026-01-01").plusDays(i)))
    }.toDF("lid", "key", "ldate")
    val hotRight = (1L to 300L).map { j =>
      (s"R$j", "HOT", java.sql.Date.valueOf(java.time.LocalDate.parse("2026-01-01").plusDays(j)))
    }.toDF("rid", "key", "rdate")
    val (hn, hb) = BandJoin.pairCounts(hotLeft, hotRight, "key", "ldate", "rdate", 7)
    assert(hn == 300L * 300L && hb < hn / 3)
    val hotNaive = hotLeft.join(hotRight,
      hotLeft("key") === hotRight("key") && abs(datediff($"ldate", $"rdate")) <= 7, "left")
      .select($"lid", $"rid").collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val hotAuto = BandJoin.autoBandedLeftJoin(hotLeft, hotRight, "lid", "key", "ldate", "rdate", 7,
        minPairs = 0L)
      .select($"lid", $"rid").collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(hotAuto == hotNaive)
  }

  test("VecSumAgg equals the posexplode vector sum (incl. ragged lengths)") {
    import org.apache.spark.sql.functions.udaf
    val df = Seq(
      (0L, Seq(1.0, 2.0, 3.0)), (0L, Seq(10.0, 20.0, 30.0)),
      (1L, Seq(0.5, -0.5)), (1L, Seq(1.5, 2.5, 4.0)), // ragged within group
      (2L, Seq.empty[Double])
    ).toDF("g", "v")
    val vecSum = udaf(graft.expressions.VecSumAgg)
    val agg = df.groupBy($"g").agg(vecSum($"v").as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(agg(0L) == Seq(11.0, 22.0, 33.0))
    assert(agg(1L) == Seq(2.0, 2.0, 4.0))
    assert(agg(2L) == Seq.empty[Double])
    val exploded = df.select($"g", posexplode($"v"))
      .groupBy($"g", $"pos").agg(sum($"col").as("s"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    agg.foreach { case (g, s) =>
      s.zipWithIndex.foreach { case (x, i) => assert(exploded((g, i)) == x) }
    }
  }
}
