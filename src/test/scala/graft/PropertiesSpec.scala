package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops.{Digest, LogCatalog, LogLines}

/** The SURVEY §5.2.3 property suite over random catalogs/strings:
  * top-K ⊆ sorted prefix (W1/O1-O2), open-hour exclusion (P3), day-set
  * dedup (P4), date-or-'unknown' extraction (F8/G2), plus normalization
  * idempotence (F18).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 12): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val hourGen: Gen[String] = for {
    day <- Gen.choose(1, 28)
    month <- Gen.choose(1, 12)
    hour <- Gen.choose(0, 23)
  } yield f"2019-$month%02d-$day%02d-$hour%02d"

  private val catalogGen: Gen[List[String]] =
    Gen.nonEmptyListOf(hourGen).map(_.distinct.take(40)
      .map(h => s"error/postgresql.log.$h"))

  private val refGen: Gen[(List[String], String, Int)] = for {
    cat <- catalogGen
    ref <- hourGen
    k <- Gen.choose(1, 10)
  } yield (cat, ref, k)

  test("property: selectLogFiles(k) is a prefix of the sorted closed-file list (W1)") {
    check(Prop.forAll(refGen) { case (cat, ref, k) =>
      val catalog = cat.toDF("file_name")
      val got = LogCatalog.selectLogFiles(catalog, ref, k)
        .as[String].collect().toList
      // reference semantics computed directly in Scala
      val days = (0 until math.max(k / 24, 1)).map(i =>
        java.time.LocalDateTime.parse(ref + ":00",
          java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd-HH:mm"))
          .minusDays(i).toLocalDate.toString) :+
        java.time.LocalDateTime.parse(ref + ":00",
          java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd-HH:mm"))
          .minusHours(k).toLocalDate.toString
      val eligible = cat.filter(f => days.exists(f.contains))
        .filterNot(_.endsWith(ref))
        .filter(_.takeRight(13) <= ref) // format is sort-compatible
        .sortBy((f: String) => f.takeRight(13)).reverse
      got == eligible.take(k)
    })
  }

  test("property: no selected file ends with the reference hour (P3)") {
    check(Prop.forAll(refGen) { case (cat, ref, k) =>
      !LogCatalog.selectLogFiles(cat.toDF("file_name"), ref, k)
        .as[String].collect().exists(_.endsWith(ref))
    })
  }

  test("property: extracted day-set is duplicate-free (P4)") {
    check(Prop.forAll(catalogGen) { cat =>
      val days = cat.toDF("file_name")
        .select(Digest.extractDate(col("file_name")).as("day"))
        .distinct().as[String].collect()
      days.length == days.distinct.length
    })
  }

  test("property: extractDate yields a real date or 'unknown' (F8/G2)") {
    val anyStr = Gen.listOfN(12, Gen.asciiPrintableChar).map(_.mkString)
    check(Prop.forAll(Gen.oneOf(anyStr, hourGen.map("x" + _))) { s =>
      val got = Seq(s).toDF("f")
        .select(Digest.extractDate(col("f"))).as[String].head()
      got == "unknown" || got.matches("\\d{4}-\\d{2}-\\d{2}")
    })
  }

  test("property: as-of join (window carry-forward) ≡ naive range formulation") {
    // random event streams: the union+window implementation must agree
    // with the quadratic join-then-argmax definition on every input
    val evGen = Gen.listOfN(25, for {
      id <- Gen.choose(1L, 1000L)
      tsSec <- Gen.choose(0L, 3600L)
      user <- Gen.choose(1L, 3L)
      kind <- Gen.oneOf("click", "purchase", "view")
    } yield (id, new java.sql.Timestamp(1704100000000L + tsSec * 1000),
      user, kind, 1.0)).map(_.distinctBy(_._1))
    check(Prop.forAll(evGen) { evs =>
      val df = evs.toDF("event_id", "ts", "user_id", "event_type", "value")
      val got = graft.ops.Reports.asofJoin(df, "purchase", "click").collect()
        .map(r => (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3)))
        .toSet
      // naive: per purchase, max (ts, event_id) click with ts <= purchase ts
      val clicks = evs.filter(_._4 == "click")
      val want = evs.filter(_._4 == "purchase").map { p =>
        val cands = clicks.filter(c => c._3 == p._3 && !c._2.after(p._2))
        val best = if (cands.isEmpty) -1L
          else cands.maxBy(c => (c._2.getTime, c._1))._1
        (p._1, best)
      }.toSet
      got == want
    }, n = 8)
  }

  test("property: as-of joins (both directions) match the brute-force " +
    "reference on random event sets, ties and all") {
    // pins the reversed-sort running-frame rewrite of the forward
    // direction: small ts/user domains force heavy equal-ts ties and
    // interleavings the hand-written cases cannot enumerate
    val eventsGen: Gen[List[(Long, Int, Int, String)]] =
      Gen.choose(4, 40).flatMap { n =>
        Gen.listOfN(n, for {
          u <- Gen.choose(1, 3)
          t <- Gen.choose(0, 6)
          typ <- Gen.oneOf("purchase", "click", "view")
        } yield (u, t, typ))
      }.map(_.zipWithIndex.map { case ((u, t, typ), i) =>
        (i.toLong + 1, u, t, typ) })
    check(Prop.forAll(eventsGen) { rows =>
      val df = rows.map { case (id, u, t, typ) =>
        (u.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 10:0$t%d:00"),
          id, typ, 1.0)
      }.toDF("user_id", "ts", "event_id", "event_type", "value")
      // brute force over the raw rows
      val purchases = rows.filter(_._4 == "purchase")
      val clicks = rows.filter(_._4 == "click")
      def backRef(p: (Long, Int, Int, String)): Long =
        clicks.filter(c => c._2 == p._2 && c._3 <= p._3)
          .sortBy(c => (c._3, c._1)).lastOption.map(_._1).getOrElse(-1L)
      def fwdRef(p: (Long, Int, Int, String)): Long =
        clicks.filter(c => c._2 == p._2 && c._3 >= p._3)
          .sortBy(c => (c._3, c._1)).headOption.map(_._1).getOrElse(-1L)
      def got(out: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        out.collect().map(r => r.getLong(1) ->
          (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      val back = got(graft.ops.Reports.asofJoin(df, "purchase", "click"))
      val fwd = got(graft.ops.Reports.asofJoinForward(df, "purchase", "click"))
      purchases.forall { p =>
        back(p._1) == backRef(p) && fwd(p._1) == fwdRef(p)
      }
    }, n = 8)
  }

  test("property: collapsed dup-clustering ≡ uncollapsed on random " +
    "duplicate-heavy corpora (n53)") {
    // small vocabulary forces shingle collisions AND exact duplicates;
    // short docs exercise the eligibility filter, singleton and isolated
    // exact-dup-group branches of the expansion
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta")
    val doc = Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.choose(6, 14).flatMap(n => Gen.listOfN(n, doc))
    check(Prop.forAll(corpus) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def clusters(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Long](2).mkString(","))).toSet
      clusters(graft.ops.Dedup.dupClustersCollapsed(docs)) ==
        clusters(graft.ops.Dedup.dupClustersLogN(
          graft.ops.Dedup.lshCandidatePairs(docs)))
    }, n = 6)
  }

  test("property: permuted-table pair index ≡ brute-force hamming over " +
    "random 60-bit signatures, incl. near-dup-planted sets (n113)") {
    // random signatures rarely sit within hamming 3, so half the cases
    // plant explicit near-dups (flip ≤ 3 random bits of a base) to
    // exercise the hit path, not just the empty result
    val sigGen: Gen[List[Long]] = for {
      n <- Gen.choose(4, 12)
      base <- Gen.listOfN(n, Gen.choose(0L, (1L << 60) - 1))
      planted <- Gen.choose(0, 3).flatMap(k => Gen.listOfN(k, for {
        src <- Gen.choose(0, n - 1)
        flips <- Gen.choose(0, 3)
        bits <- Gen.listOfN(flips, Gen.choose(0, 59))
      } yield bits.foldLeft(base(src))((s, b) => s ^ (1L << b))))
    } yield base ++ planted
    check(Prop.forAll(sigGen) { sigs =>
      val idx = sigs.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "simhash")
      val got = graft.ops.Dedup
        .simhashNearDupPairsPermutedFromIndex(idx).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val arr = sigs.zipWithIndex
      val brute = (for {
        (sa, ia) <- arr; (sb, ib) <- arr if ia < ib
        d = java.lang.Long.bitCount(sa ^ sb) if d <= 3
      } yield (ia.toLong, ib.toLong, d)).toSet
      got == brute
    }, n = 10)
  }

  test("property: the m5 pigeonhole config (64-bit / 8 blocks / keep 4, " +
    "hamming ≤ 4) ≡ brute force over random FULL-RANGE 64-bit " +
    "signatures, incl. planted near-dups — the image-dedup parameters, " +
    "sign bit exercised") {
    val sigGen: Gen[List[Long]] = for {
      n <- Gen.choose(4, 12)
      base <- Gen.listOfN(n, Gen.choose(Long.MinValue, Long.MaxValue))
      planted <- Gen.choose(0, 3).flatMap(k => Gen.listOfN(k, for {
        src <- Gen.choose(0, n - 1)
        flips <- Gen.choose(0, 4)
        bits <- Gen.listOfN(flips, Gen.choose(0, 63))
      } yield bits.foldLeft(base(src))((s, b) => s ^ (1L << b))))
    } yield base ++ planted
    check(Prop.forAll(sigGen) { sigs =>
      val idx = sigs.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "simhash")
      val got = graft.ops.Dedup
        .simhashNearDupPairsPermutedFromIndex(idx, bits = 64,
          maxDist = 4, nBlocks = 8, nKeep = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val arr = sigs.zipWithIndex
      val brute = (for {
        (sa, ia) <- arr; (sb, ib) <- arr if ia < ib
        d = java.lang.Long.bitCount(sa ^ sb) if d <= 4
      } yield (ia.toLong, ib.toLong, d)).toSet
      got == brute
    }, n = 10)
  }

  test("property: paragraphDedupBlocks ≡ naive Scala keep-first over " +
    "random corpora with planted copied blocks (n140)") {
    // words from a tiny vocabulary so whole-block collisions are
    // common; k = 3 so multi-block docs are cheap
    val word = Gen.oneOf("aa", "bb", "cc")
    val doc = Gen.choose(1, 8).flatMap(Gen.listOfN(_, word))
    val corpus = Gen.choose(2, 8).flatMap(Gen.listOfN(_, doc))
    check(Prop.forAll(corpus) { docsW =>
      val k = 3
      val rows = docsW.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      val got = graft.ops.TextAnalysis
        .paragraphDedupBlocks(rows.toDF("doc_id", "text"), k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toList
      // naive: global (doc_id, pidx) scan, first occurrence of each
      // block text kept
      val seen = scala.collection.mutable.Set.empty[String]
      val want = rows.map { case (id, text) =>
        val ws = text.split(" ", -1)
        val blocks = ws.grouped(k).map(_.mkString(" ")).toList
        val kept = blocks.filter { b =>
          if (seen.contains(b)) false else { seen += b; true }
        }
        (id, blocks.length.toLong, (blocks.length - kept.length).toLong,
          kept.mkString(" "))
      }
      got == want
    }, n = 12)
  }

  test("property: collapsed semantic dedup ≡ uncollapsed on random " +
    "vectors with copies, zero vectors, and null embeddings (n54)") {
    // coordinates from a tiny set so exact copies are common; the zero
    // vector appears naturally and must always survive both paths; null
    // embeddings (1-in-5) must too — null cosine fails every threshold
    val coord = Gen.oneOf(-1.0f, 0.0f, 1.0f)
    val vec = Gen.frequency(
      (4, Gen.listOfN(3, coord).map(v => v.toArray)),
      (1, Gen.const(null.asInstanceOf[Array[Float]])))
    val corpus = Gen.choose(5, 12).flatMap(n => Gen.listOfN(n, vec))
    // NoShrink: ScalaCheck's container shrinker NPEs on a null array
    // element, which would MASK any real counterexample behind the NPE
    check(Prop.forAllNoShrink(corpus) { vecs =>
      val emb = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v, i % 3) }
        .toDF("vec_id", "embedding", "label")
      def keep(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      keep(graft.ops.Similarity.semanticDedupCollapsed(emb, 0.3, 4)) ==
        keep(graft.ops.Similarity.semanticDedup(emb, 0.3, 4))
    }, n = 6)
  }

  test("property: lshTuning's truth count matches a naive Scala oracle; " +
    "hits bounded by both sides") {
    val docGen = for {
      n <- Gen.choose(5, 25)
      ids <- Gen.listOfN(n, Gen.choose(0L, 120L)).map(_.distinct)
      wss <- Gen.listOfN(ids.size, Gen.choose(3, 10)
        .flatMap(k => Gen.listOfN(k, Gen.oneOf("aa", "bb", "cc", "dd", "ee"))))
    } yield ids.zip(wss.map(_.mkString(" ")))
    check(Prop.forAll(docGen) { docs =>
      val r = graft.ops.Dedup.lshTuning(docs.toDF("doc_id", "text"), 50, 0.5)
        .head()
      val sets = docs.map { case (id, t) =>
        id -> t.split(" ").toSeq.sliding(3).filter(_.size == 3)
          .map(_.mkString(" ")).toSet
      }.toMap
      val ids = docs.map(_._1)
      val nTruth = (for {
        a <- ids; b <- ids
        if b > a && b <= a + 50
        u = (sets(a) ++ sets(b)).size
        if u > 0 && sets(a).intersect(sets(b)).size.toDouble / u >= 0.5
      } yield 1).size.toLong
      r.getLong(0) == nTruth &&
        r.getLong(2) <= math.min(r.getLong(0), r.getLong(1))
    }, n = 8)
  }

  test("property: shardAssignment partitions the corpus and matches the " +
    "reference md5 hash") {
    val gen = for {
      n <- Gen.choose(1, 40)
      ids <- Gen.listOfN(n, Gen.choose(0L, 100000L)).map(_.distinct)
      k <- Gen.choose(1, 8)
    } yield (ids, k)
    check(Prop.forAll(gen) { case (ids, k) =>
      val got = graft.ops.TextAnalysis
        .shardAssignment(ids.map((_, "t")).toDF("doc_id", "text"), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      def refShard(id: Long): Long =
        java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"shard|$id".getBytes("UTF-8")).take(4)
            .map("%02x".format(_)).mkString, 16) % k
      got.map(_._1).toSet == ids.toSet &&
        got.forall { case (id, s, _) => s == refShard(id) } &&
        got.groupBy(_._2).values.forall(rows =>
          rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }, n = 10)
  }

  test("property: semanticDecontaminate survivors equal the exact Scala " +
    "complement (zero-norm and null embeddings included)") {
    val vecGen: Gen[Option[List[Float]]] = Gen.frequency(
      8 -> Gen.listOfN(3, Gen.choose(-5, 5)).map(l => Option(l.map(_.toFloat))),
      1 -> Gen.const(Option(List(0f, 0f, 0f))),
      1 -> Gen.const(Option.empty[List[Float]]))
    val gen = for {
      n <- Gen.choose(3, 30)
      vs <- Gen.listOfN(n, vecGen)
    } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    // forAllNoShrink: the container shrinker NPEs on null array elements
    check(Prop.forAllNoShrink(gen) { rows =>
      val tau = 0.35
      def cos(a: List[Double], b: List[Double]): Option[Double] = {
        val na = math.sqrt(a.map(x => x * x).sum)
        val nb = math.sqrt(b.map(x => x * x).sum)
        if (na * nb == 0) None
        else Some(BigDecimal(a.zip(b).map { case (x, y) => x * y }.sum /
            (na * nb))
          .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val probes = rows.filter(_._1 < 2).flatMap(_._2)
        .map(_.map(_.toDouble))
      val expected = rows.filter(_._1 >= 2).filter {
        case (_, None) => true
        case (_, Some(vec)) =>
          val cs = probes.flatMap(p => cos(p, vec.map(_.toDouble)))
          cs.isEmpty || cs.max < tau
      }.map(_._1).toSet
      val got = graft.ops.Similarity
        .semanticDecontaminate(rows.toDF("vec_id", "embedding"), 2, tau)
        .collect().map(_.getLong(0)).toSet
      got == expected
    }, n = 10)
  }

  test("property: vocabCoverage matches the naive Scala oracle exactly") {
    val gen = for {
      n <- Gen.choose(2, 20)
      texts <- Gen.listOfN(n, Gen.choose(1, 8).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))
          .map(_.mkString(" "))))
      k <- Gen.choose(1, 5)
    } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }, k)
    check(Prop.forAll(gen) { case (docs, k) =>
      val got = graft.ops.TextAnalysis
        .vocabCoverage(docs.toDF("doc_id", "text"), k)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      val tf = docs.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (w, xs) => (w, xs.size) }
      val vocab = tf.toSeq.sortBy { case (w, c) => (-c, w) }.take(k)
        .map(_._1).toSet
      val want = docs.sortBy(_._1).map { case (id, t) =>
        val toks = t.split(" ").toSeq
        val oov = toks.count(!vocab.contains(_))
        (id, toks.size.toLong, oov.toLong,
          math.rint(oov.toDouble / toks.size * 1e6) / 1e6)
      }
      got.toSeq == want
    }, n = 10)
  }

  test("property: datasetCard matches the naive Scala roll-up") {
    val gen = for {
      n <- Gen.choose(1, 25)
      rows <- Gen.listOfN(n, for {
        src <- Gen.oneOf("s1", "s2")
        lang <- Gen.oneOf("en", "fr", "de")
        nw <- Gen.choose(1, 40)
        w <- Gen.oneOf("the", "xx") // 'the' is a stopword; 'xx' is not
      } yield (src, lang, Seq.fill(nw)(w).mkString(" ")))
    } yield rows.zipWithIndex.map { case ((s, l, t), i) => (i.toLong, t, l, s) }
    check(Prop.forAll(gen) { docs =>
      val got = graft.ops.TextAnalysis
        .datasetCard(docs.toDF("doc_id", "text", "lang", "source"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getDouble(6), r.getDouble(7))).toMap
      docs.groupBy(_._4).forall { case (src, rows) =>
        val nDocs = rows.size.toLong
        val uniq = rows.map(_._2).distinct.size.toLong
        val langs = rows.map(_._3).distinct.size.toLong
        val toks = rows.map(_._2.split(" ").length.toLong).sum
        // stop_ratio is 0.0 ('xx' docs) or 1.0 ('the' docs) — quality
        // is exactly the long-enough all-'xx' docs
        val q = rows.count(r => r._2.split(" ").length >= 30 &&
          r._2.startsWith("xx")).toLong
        got(src) == ((nDocs, uniq, langs, toks, q,
          math.rint((1d - uniq.toDouble / nDocs) * 1e6) / 1e6,
          math.rint(toks.toDouble / nDocs * 1e6) / 1e6))
      }
    }, n = 10)
  }

  test("property: lengthOutliers thresholds equal the interpolated " +
    "quantile and flag exactly the strict outliers") {
    val gen = for {
      n <- Gen.choose(2, 30)
      nws <- Gen.listOfN(n, Gen.choose(1, 200))
    } yield nws.zipWithIndex.map { case (nw, i) =>
      (i.toLong, Seq.fill(nw)("w").mkString(" "), "src") }
    check(Prop.forAll(gen) { docs =>
      val r = graft.ops.TextAnalysis
        .lengthOutliers(docs.toDF("doc_id", "text", "source")).head()
      val nws = docs.map(_._2.split(" ").length.toDouble).sorted
      def quant(p: Double): Double = {
        val pos = p * (nws.size - 1)
        val lo = nws(pos.toInt)
        val hi = nws(math.min(nws.size - 1, pos.toInt + 1))
        val frac = pos - pos.toInt
        math.rint((lo + (hi - lo) * frac) * 1e4) / 1e4
      }
      val (p05, p95) = (quant(0.05), quant(0.95))
      r.getLong(1) == nws.size.toLong &&
        r.getDouble(2) == p05 && r.getDouble(3) == p95 &&
        r.getLong(4) == nws.count(_ < p05).toLong &&
        r.getLong(5) == nws.count(_ > p95).toLong
    }, n = 10)
  }

  test("property: labelCentroidOutliers is row-order and partitioning " +
    "invariant (the decimal centroid is fold-order-independent)") {
    val gen = for {
      n <- Gen.choose(2, 20)
      rows <- Gen.listOfN(n, for {
        label <- Gen.oneOf("a", "b")
        vec <- Gen.option(Gen.listOfN(3, Gen.choose(-100, 100)
          .map(_ / 7.0f)))
      } yield (label, vec.map(_.toArray).orNull))
    } yield rows.zipWithIndex.map { case ((l, v), i) => (i.toLong, l, v) }
    check(Prop.forAll(gen) { rows =>
      val df = rows.toDF("vec_id", "label", "embedding")
      val base = graft.ops.Similarity
        .labelCentroidOutliers(df, 0.3).collect().toSeq
      val shuffled = graft.ops.Similarity
        .labelCentroidOutliers(
          rows.reverse.toDF("vec_id", "label", "embedding").repartition(7),
          0.3).collect().toSeq
      base == shuffled
    }, n = 8)
  }

  // the real splitCol reimplemented directly (first 8 md5 hex chars of
  // the id string, mod 100) so the properties below never depend on the
  // code under test for their own ground truth
  private def naiveSplit(id: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(d, 16) % 100 match {
      case b if b < 80 => "train"
      case b if b < 90 => "val"
      case _           => "test"
    }
  }

  private val smallCorpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(8, 30)
    texts <- Gen.listOfN(n, Gen.choose(3, 8).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))
        .map(_.mkString(" "))))
  } yield texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }

  test("property: boilerplateCoverage matches the naive positional oracle") {
    check(Prop.forAll(smallCorpusGen) { docs =>
      val got = graft.ops.TextAnalysis
        .boilerplateCoverage(docs.toDF("doc_id", "text"), 2, 2)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      def grams(t: String): Seq[String] =
        t.split(" ").toSeq.sliding(2).filter(_.size == 2)
          .map(_.mkString(" ")).toSeq
      val df = docs.flatMap { case (_, t) => grams(t).distinct }
        .groupBy(identity).map { case (g, xs) => g -> xs.size }
      val hot = df.collect { case (g, c) if c >= 2 => g }.toSet
      val want = docs.sortBy(_._1).map { case (id, t) =>
        val ws = t.split(" ").toSeq
        val cov = ws.indices.dropRight(1)
          .filter(i => hot(ws(i) + " " + ws(i + 1)))
          .flatMap(i => Seq(i, i + 1)).distinct.size
        (id, ws.size.toLong, cov.toLong,
          math.rint(cov.toDouble / ws.size * 1e6) / 1e6)
      }
      got.toSeq == want
    }, n = 10)
  }

  test("property: minhashDecontamination is sound (every flagged pair is " +
    "a real test→train near-dup) and catches every exact test→train copy") {
    check(Prop.forAll(smallCorpusGen) { docs =>
      val byId = docs.toMap
      val got = graft.ops.Dedup
        .minhashDecontamination(docs.toDF("doc_id", "text"), 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      def jac(a: String, b: String): Double = {
        val (wa, wb) = (a.split(" ").toSet, b.split(" ").toSet)
        math.rint((wa & wb).size.toDouble / (wa | wb).size * 1e6) / 1e6
      }
      val sound = got.forall { case (t, tr, j) =>
        naiveSplit(t) == "test" && naiveSplit(tr) == "train" &&
          j == jac(byId(t), byId(tr)) && j >= 0.5
      }
      // identical texts share every band key, so an exact test→train
      // copy (with at least one 3-word shingle) can never be missed
      val flagged = got.map(p => (p._1, p._2)).toSet
      val complete = docs.forall { case (t, text) =>
        naiveSplit(t) != "test" || text.split(" ").length < 3 ||
          docs.forall { case (tr, text2) =>
            naiveSplit(tr) != "train" || text2 != text || flagged((t, tr))
          }
      }
      sound && complete
    }, n = 10)
  }

  test("property: dsirWeights matches the naive log-ratio oracle") {
    check(Prop.forAll(smallCorpusGen) { docs =>
      val got = graft.ops.TextAnalysis
        .dsirWeights(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
      def cnt(split: String): Map[String, Long] = toks
        .filter { case (id, _) => naiveSplit(id) == split }
        .flatMap(_._2).groupBy(identity)
        .map { case (w, g) => w -> g.size.toLong }
      val (ct, cr) = (cnt("val"), cnt("train"))
      val nt = ct.values.sum; val nr = cr.values.sum
      val v = toks.flatMap(_._2).toSet.size
      val want = toks.filter { case (id, _) => naiveSplit(id) == "train" }
        .sortBy(_._1).map { case (id, ws) =>
          val terms = ws.map { w =>
            BigDecimal(
              math.log((ct.getOrElse(w, 0L) + 1).toDouble / (nt + v)) -
                math.log((cr.getOrElse(w, 0L) + 1).toDouble / (nr + v)))
              .setScale(9, BigDecimal.RoundingMode.HALF_UP)
          }
          (id, ws.size.toLong,
            BigDecimal(terms.sum.toDouble / terms.size)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      got.toSeq == want
    }, n = 10)
  }

  test("property: bpeMerges equals a naive Scala BPE, rule for rule") {
    check(Prop.forAll(smallCorpusGen) { docs =>
      val got = graft.ops.TextAnalysis
        .bpeMerges(docs.toDF("doc_id", "text"), 6)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4)))
      // reference BPE on the word-frequency table
      val freqs = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      var table: Map[Vector[String], Long] = freqs.toSeq
        .map { case (w, f) => w.map(_.toString).toVector -> f }
        .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      val want = scala.collection.mutable.ArrayBuffer
        .empty[(Int, String, String, String, Long)]
      var stop = false
      for (round <- 1 to 6 if !stop) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        table.foreach { case (syms, f) =>
          syms.zip(syms.tail).foreach(p =>
            counts(p) = counts.getOrElse(p, 0L) + f)
        }
        if (counts.isEmpty) stop = true
        else {
          val ((l, r), cnt) = counts.toSeq
            .minBy { case ((l, r), c) => (-c, l, r) }
          want += ((round, l, r, l + r, cnt))
          table = table.toSeq.map { case (syms, f) =>
            syms.foldLeft(Vector.empty[String])((acc, x) =>
              if (acc.nonEmpty && acc.last == l && x == r)
                acc.init :+ (l + r)
              else acc :+ x) -> f
          }.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
        }
      }
      got.toSeq == want.toSeq
    }, n = 8)
  }

  test("property: BpeSegment (codegen'd production segmenter) ≡ the " +
    "nested-HOF bpeSegmentHof anchor, array for array, on random words " +
    "and random rule sequences incl. duplicate pairs and merged-output " +
    "sides") {
    // rules are NOT restricted to trainer-shaped sequences: sides may
    // reference symbols no earlier rule can build, pairs may repeat
    // (the fold runs BOTH passes — the later one can fire on
    // adjacencies that only exist after intermediate merges), and
    // merged outputs may collide with later rules' sides. The
    // expression must match the fold on ALL of them, not just trained
    // models.
    val symGen = Gen.oneOf("a", "b", "c", "ab", "bc", "abc", "é", "日")
    val ruleGen = Gen.zip(symGen, symGen)
    val caseGen = for {
      nRules <- Gen.choose(0, 12)
      rules <- Gen.listOfN(nRules, ruleGen)
      words <- Gen.nonEmptyListOf(
        Gen.choose(0, 10).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf("a", "b", "c", "é", "日", "😀"))
            .map(_.mkString)))
    } yield (rules, words.distinct.take(12))
    check(Prop.forAll(caseGen) { case (rules, wordList) =>
      val df = wordList.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("id", "word")
      val both = df.select(col("id"),
          graft.functions.BpeSegment.bpeSegment(col("word"), rules)
            .as("expr"),
          graft.ops.TextAnalysis.bpeSegmentHof(col("word"), rules)
            .as("hof"))
        .collect()
        .map(r => (r.getSeq[String](1).toList, r.getSeq[String](2).toList))
      both.forall { case (e, h) => e == h }
    }, n = 20)
  }

  test("property: bpeMergesBatched ≡ bpeMerges rule for rule on random " +
    "corpora, across batch/pool shapes") {
    // bpeMerges is itself property-pinned to the naive Scala BPE above,
    // so equality here transitively proves the batched selection emits
    // the exact sequential rule sequence — counts, tie-breaks, order
    check(Prop.forAll(smallCorpusGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      def rules(m: org.apache.spark.sql.DataFrame) =
        m.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
      val seq = rules(graft.ops.TextAnalysis.bpeMerges(df, 8))
      // tiny pool forces the tail bound into play; batchK=3 exercises
      // mid-batch stops
      rules(graft.ops.TextAnalysis.bpeMergesBatched(df, 8, 3, 8)) == seq &&
        rules(graft.ops.TextAnalysis.bpeMergesBatched(df, 8, 16, 64)) == seq
    }, n = 6)
  }

  test("bpeMergesBatched: adversarial interaction shapes still match the " +
    "sequential rules exactly") {
    def rules(m: org.apache.spark.sql.DataFrame) =
      m.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    // 1. equal-count pair AFTER a disjoint candidate in argmax order
    //    interacts with the first accept and mints a lexicographically
    //    earlier pair: "x a b"×10 + "c d"×10 — sequential merges (a,b)
    //    then (x,ab); a naive disjoint-prefix batcher would wrongly take
    //    {(a,b),(c,d)}
    // 2. overlapping run under a self-pair ("a a a") — leftmost-first
    // 3. the merged pair's string also occurring as a standalone word
    //    ("ab" a word AND the merge of (a,b)) — the symbol-string
    //    collision shape the preexisting-symbol guard is about
    val corpora = Seq(
      (1 to 10).map(i => (i.toLong, "x a b")) ++
        (11 to 20).map(i => (i.toLong, "c d")),
      (1 to 6).map(i => (i.toLong, "a a a b b")) ++
        (7 to 9).map(i => (i.toLong, "c c")),
      (1 to 8).map(i => (i.toLong, "ab a b q r")) ++
        (9 to 12).map(i => (i.toLong, "ab ab s t")))
    for (c <- corpora) {
      val df = c.toDF("doc_id", "text")
      val seq = rules(graft.ops.TextAnalysis.bpeMerges(df, 8))
      val bat = rules(graft.ops.TextAnalysis.bpeMergesBatched(df, 8, 4, 16))
      assert(bat === seq, s"corpus ${c.take(2)}…")
    }
  }

  test("property: bpeTokenize equals the naive application of the same " +
    "trained rules") {
    check(Prop.forAll(smallCorpusGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val merges = graft.ops.TextAnalysis.bpeMerges(df, 4)
      val rules = merges.orderBy(col("round")).collect()
        .map(r => (r.getString(1), r.getString(2)))
      val got = graft.ops.TextAnalysis.bpeTokenize(df, merges).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      def pieces(word: String): Int =
        rules.foldLeft(word.map(_.toString).toVector) { case (seg, (l, r)) =>
          seg.foldLeft(Vector.empty[String])((acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
            else acc :+ x)
        }.size
      val want = docs.sortBy(_._1).map { case (id, t) =>
        val ws = t.split(" ").toSeq
        val np = ws.map(pieces).sum.toLong
        (id, ws.size.toLong, np,
          math.rint(np.toDouble / ws.size * 1e6) / 1e6)
      }
      got.toSeq == want
    }, n = 8)
  }

  test("property: unimaxMix ≡ the naive iterative waterfill on random " +
    "source profiles and budgets") {
    val profileGen = for {
      n <- Gen.choose(1, 6)
      sizes <- Gen.listOfN(n, Gen.choose(1, 40))
      budget <- Gen.choose(1L, 500L)
    } yield (sizes.zipWithIndex.map { case (w, i) => (s"s$i", w) }, budget)
    def naive(caps: Seq[(String, Long)], budget: Long): Map[String, Long] = {
      val sorted = caps.sortBy(c => (c._2, c._1))
      var r = budget
      var m = sorted.size
      var share = -1L
      var out = Map.empty[String, Long]
      for ((s, cap) <- sorted) {
        if (share < 0 && cap * m <= r) { out += s -> cap; r -= cap; m -= 1 }
        else {
          if (share < 0) share = r / m
          out += s -> share
        }
      }
      out
    }
    check(Prop.forAll(profileGen) { case (profile, budget) =>
      val docs = profile.zipWithIndex.map { case ((src, w), i) =>
        (i.toLong, (1 to w).map(j => s"t$j").mkString(" "), src)
      }.toDF("doc_id", "text", "source")
      val got = graft.ops.TextAnalysis.unimaxMix(docs, budget, 2.0)
        .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
      val want = naive(profile.map { case (s, w) => (s, 2L * w) }, budget)
      got == want
    })
  }

  test("property: zipfFit slope/intercept match a naive Scala least " +
    "squares on random corpora") {
    val corpusGen = for {
      n <- Gen.choose(2, 8)
      freqs <- Gen.listOfN(n, Gen.choose(1, 12))
    } yield freqs
    check(Prop.forAll(corpusGen) { freqs =>
      val text = freqs.zipWithIndex
        .flatMap { case (f, i) => Seq.fill(f)(f"w$i%02d") }.mkString(" ")
      val docs = Seq((1L, text, "src")).toDF("doc_id", "text", "source")
      val row = graft.ops.TextAnalysis.zipfFit(docs, 100).collect().head
      // naive: rank by (tf desc, word asc), plain-double least squares
      val ranked = freqs.zipWithIndex.map { case (f, i) => (f"w$i%02d", f) }
        .sortBy { case (w, f) => (-f, w) }.zipWithIndex
        .map { case ((_, f), r) => (math.log(r + 1.0), math.log(f.toDouble)) }
      val n = ranked.size.toDouble
      val (sx, sy) = (ranked.map(_._1).sum, ranked.map(_._2).sum)
      val sxy = ranked.map(p => p._1 * p._2).sum
      val sxx = ranked.map(p => p._1 * p._1).sum
      val varx = n * sxx - sx * sx
      if (ranked.size == 1 || varx == 0)
        row.isNullAt(2)
      else {
        val slope = (n * sxy - sx * sy) / varx
        val icept = (sy - slope * sx) / n
        math.abs(row.getDouble(2) - slope) < 1e-5 &&
          math.abs(row.getDouble(3) - icept) < 1e-5
      }
    })
  }

  test("property: temperatureMix realized counts match a naive Scala " +
    "recomputation (integer keep test end to end)") {
    val corpusGen = for {
      n <- Gen.choose(1, 24)
      rows <- Gen.listOfN(n, for {
        w <- Gen.choose(1, 20)
        s <- Gen.oneOf("a", "b", "c")
      } yield (w, s))
      budget <- Gen.choose(10L, 400L)
    } yield (rows.zipWithIndex.map { case ((w, s), i) => (i.toLong, w, s) },
      budget)
    def b6Of(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"tmix|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    check(Prop.forAll(corpusGen) { case (rows, budget) =>
      val docs = rows.map { case (id, w, s) =>
        (id, (1 to w).map(j => s"t$j").mkString(" "), s)
      }.toDF("doc_id", "text", "source")
      val got = graft.ops.TextAnalysis.temperatureMix(docs, 0.5, budget)
        .collect().map(r => r.getString(0) -> (r.getLong(6), r.getLong(7)))
        .toMap
      // naive plan: same rounding path in plain Scala
      val bySrc = rows.groupBy(_._3)
      val w6 = bySrc.view.mapValues(rs =>
        BigDecimal(math.pow(rs.map(_._2).sum.toDouble, 0.5))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).toMap
      val sw = w6.values.sum
      val want = bySrc.map { case (src, rs) =>
        // mirror the engine exactly: decimal→double FIRST, then a
        // double division, then the 6-decimal round
        val p = BigDecimal(w6(src).toDouble / sw.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val target = math.floor(budget.toDouble * p).toLong
        val nTok = rs.map(_._2).sum.toLong
        val thresh = math.min(1000000L,
          math.floor(target.toDouble * 1000000d / nTok).toLong)
        val kept = rs.filter(r => b6Of(r._1) < thresh)
        src -> (kept.size.toLong, kept.map(_._2).sum.toLong)
      }
      got == want
    })
  }

  test("property: boilerplateSpans ≡ naive Scala islands on random " +
    "small-alphabet corpora (n106)") {
    // 3-letter alphabet so repeated grams actually arise; n=2 keeps
    // short random docs in play
    val docGen = Gen.listOf(
      Gen.choose(2, 8).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))))
      .map(_.take(8))
    check(Prop.forAll(docGen) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.ops.TextAnalysis.boilerplateSpans(docs, 2, 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toList
      // naive recompute: grams per doc, hot = df>=2 over DISTINCT docs,
      // covered = union of [pos, pos+1], islands as contiguous runs
      val ws = texts.map(_.split(" ").toList)
      val grams = ws.map(w => w.indices.dropRight(1)
        .map(i => (i, s"${w(i)} ${w(i + 1)}")))
      val hot = grams.zipWithIndex
        .flatMap { case (gs, d) => gs.map(_._2).distinct.map((_, d)) }
        .groupBy(_._1).filter(_._2.size >= 2).keySet
      val want = grams.zipWithIndex.flatMap { case (gs, d) =>
        val cov = gs.filter(g => hot(g._2))
          .flatMap(g => Seq(g._1, g._1 + 1)).distinct.sorted
        val islands = cov.foldLeft(List.empty[(Int, Int)]) {
          case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
          case (acc, p) => (p, p) :: acc
        }.reverse
        islands.map { case (s, e) => (d.toLong, s + 1, (e - s + 1).toLong) }
      }.toList
      got == want
    })
  }

  test("property: dupSubstringDedup ≡ naive Scala keep-first on random " +
    "small-alphabet corpora (n121/n122)") {
    // 2-letter alphabet, k=2 — duplicated windows arise constantly,
    // within-doc and cross-doc, exercising first-occurrence ties on pos
    val docGen = Gen.listOf(
      Gen.choose(1, 8).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b")).map(_.mkString(" "))))
      .map(_.take(8))
    check(Prop.forAll(docGen) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.ops.TextAnalysis.dupSubstringDedup(docs, 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toList
      // naive: all (doc, pos, gram) occurrences; first per gram by
      // (doc, pos); every non-first marks [pos, pos+1]; rebuild
      val ws = texts.map(_.split(" ").toList)
      val occ = ws.zipWithIndex.flatMap { case (w, d) =>
        w.indices.dropRight(1).map(i => (d, i, s"${w(i)} ${w(i + 1)}"))
      }
      val firsts = occ.groupBy(_._3)
        .map { case (g, os) => g -> os.map(o => (o._1, o._2)).min }
      val dupPos = occ
        .filter(o => occ.count(_._3 == o._3) > 1 &&
          (o._1, o._2) != firsts(o._3))
        .flatMap(o => Seq((o._1, o._2), (o._1, o._2 + 1))).toSet
      val want = ws.zipWithIndex.map { case (w, d) =>
        val kept = w.indices.filterNot(i => dupPos((d, i))).map(w)
        (d.toLong, w.size.toLong,
          w.indices.count(i => dupPos((d, i))).toLong, kept.mkString(" "))
      }.toList
      got == want
    })
  }

  test("property: corpusDigest ≡ naive Scala commutative md5 sum (n107)") {
    val corpusGen = Gen.listOf(for {
      t <- Gen.listOfN(3, Gen.oneOf("x", "y", "z")).map(_.mkString(" "))
      s <- Gen.oneOf("s0", "s1")
    } yield (t, s)).map(_.take(10)).suchThat(_.nonEmpty)
    check(Prop.forAll(corpusGen) { rows =>
      val docs = rows.zipWithIndex
        .map { case ((t, s), i) => (i.toLong, t, s) }
        .toDF("doc_id", "text", "source")
      val got = graft.ops.TextAnalysis.corpusDigest(docs).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toList
      def md5hex(s: String) = java.security.MessageDigest
        .getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val want = rows.groupBy(_._2).toList.sortBy(_._1).map { case (s, rs) =>
        (s, rs.size.toLong,
          rs.map(r => BigInt(md5hex(r._1).take(15), 16)).sum.toString)
      }
      got == want
    })
  }

  test("property: query normalization is idempotent (F18)") {
    val sqlGen = for {
      n <- Gen.choose(0, 999)
      s <- Gen.alphaNumStr.map(_.take(6))
    } yield s"SELECT * FROM t WHERE id = $n AND name = '$s'  AND  x=$n"
    check(Prop.forAll(sqlGen) { q =>
      val once = Seq(q).toDF("q")
        .select(LogLines.normalizeQuery(col("q")).as("n1"))
        .select(col("n1"), LogLines.normalizeQuery(col("n1")).as("n2"))
        .head()
      once.getString(0) == once.getString(1)
    })
  }
}
