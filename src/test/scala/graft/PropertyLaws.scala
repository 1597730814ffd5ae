package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.operators.Relational
import graft.schema.Normalize

/**
 * ScalaCheck laws (SURVEY.md §5.2). Each example runs Spark jobs, so the
 * example count is kept low; generators produce the messy value shapes the
 * reference sees (garbage ints, garbage timestamps, nulls).
 */
object PropertyLaws extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark
  import scala.jdk.CollectionConverters._

  private val cell: Gen[String] = Gen.oneOf(
    Gen.const(null: String), Gen.const(""), Gen.const("42"), Gen.const("2.9"),
    Gen.const("garbage"), Gen.const("2024-03-05 10:11:12"),
    Gen.alphaNumStr.map(_.take(8)))

  private val rowsGen: Gen[List[(String, String, String)]] =
    Gen.listOfN(6, for { a <- cell; b <- cell; c <- cell } yield (a, b, c))

  private def frame(rows: List[(String, String, String)]) = {
    import org.apache.spark.sql.{Row, types => T}
    val schema = T.StructType(Seq(
      T.StructField("user_id", T.StringType), // INT-list name
      T.StructField("created_at", T.StringType), // TIMESTAMP-list name
      T.StructField("note", T.StringType))) // default branch
    spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3)).asJava, schema)
  }

  property("normalize is idempotent on arbitrary messy frames") =
    forAll(rowsGen) { rows =>
      val once = Normalize.normalize(frame(rows))
      val twice = Normalize.normalize(once)
      once.schema == twice.schema &&
        once.collect().toSeq == twice.collect().toSeq
    }

  property("upsert result keys = main keys UNION staging keys") =
    forAll(Gen.listOf(Gen.choose(0L, 20L)), Gen.listOf(Gen.choose(0L, 20L))) {
      (mainKeys, stagingKeys) =>
        import spark.implicits._
        val main = mainKeys.distinct.map(k => (k, s"m$k")).toDF("id", "v")
        val staging = stagingKeys.distinct.map(k => (k, s"s$k")).toDF("id", "v")
        val out = Relational.upsertPlan(main, staging, "id")
        out.count() == (mainKeys ++ stagingKeys).distinct.size &&
          // staging always wins on matched keys
          out.filter(out("id").isin(stagingKeys.distinct: _*))
            .collect().forall(_.getString(1).startsWith("s"))
    }

  property("upsert is idempotent: same staging twice = once") =
    forAll(Gen.listOf(Gen.choose(0L, 10L))) { keys =>
      import spark.implicits._
      val main = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      val staging = keys.distinct.map(k => (k, s"s$k")).toDF("id", "v")
      val once = Relational.upsertPlan(main, staging, "id")
      val twice = Relational.upsertPlan(once, staging, "id")
      once.orderBy("id").collect().toSeq == twice.orderBy("id").collect().toSeq
    }

  property("sortByCreatedAt is invariant under input permutation") =
    forAll(rowsGen) { rows =>
      val a = Relational.sortByCreatedAt(
        Normalize.normalize(frame(rows)), tieBreak = Seq("user_id", "note"))
      val b = Relational.sortByCreatedAt(
        Normalize.normalize(frame(rows.reverse)), tieBreak = Seq("user_id", "note"))
      a.collect().toSeq == b.collect().toSeq
    }

  private val messyText: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.const("word"), Gen.const("WORD"), Gen.const("42"),
    Gen.const("https://x.io/a?b=1"), Gen.const("a@b.co"),
    Gen.const("  "), Gen.alphaNumStr.map(_.take(6))))
    .map(_.mkString(" "))

  property("cleanText is idempotent") =
    forAll(Gen.listOfN(4, messyText)) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = graft.operators.TextAnalysis.cleanText(docs)
      val twice = graft.operators.TextAnalysis.cleanText(
        once.withColumnRenamed("clean", "text"))
      once.orderBy("doc_id").collect().toSeq ==
        twice.orderBy("doc_id").collect().toSeq
    }

  property("repetitionScore: 0 <= ratio < 1 and distinct <= total") =
    forAll(Gen.listOfN(4, messyText)) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      graft.operators.TextAnalysis.repetitionScore(docs).collect().forall { r =>
        val (tot, dis, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
        dis <= tot && ratio >= 0.0 && ratio < 1.0 &&
          (tot > 0 || ratio == 0.0)
      }
    }

  property("intervalOverlapJoin = naive cross-join filter (bucket dedup exact)") =
    forAll(
      Gen.listOfN(8, for {
        id <- Gen.choose(0L, 1000L); s <- Gen.choose(0L, 48L); len <- Gen.choose(1L, 20L)
      } yield (id, s, s + len)),
      Gen.listOfN(8, for {
        id <- Gen.choose(0L, 1000L); s <- Gen.choose(0L, 48L); len <- Gen.choose(1L, 20L)
      } yield (id, s, s + len))) { (as, bs) =>
      import spark.implicits._
      def ts(h: Long) = new java.sql.Timestamp(1700000000000L + h * 3600000L)
      val a = as.zipWithIndex.map { case ((_, s, e), i) => (i.toLong, ts(s), ts(e)) }
        .toDF("a_id", "a_start", "a_end")
      val b = bs.zipWithIndex.map { case ((_, s, e), i) => (i.toLong, ts(s), ts(e)) }
        .toDF("b_id", "b_start", "b_end")
      val bucketed = Relational.intervalOverlapJoin(a, "a_start", "a_end",
        b, "b_start", "b_end", bucketSeconds = 7200)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val naive = a.crossJoin(b)
        .filter($"a_start" < $"b_end" && $"b_start" < $"a_end")
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      bucketed == naive
    }

  property("rangeJoin = naive cross-join filter (bucket explosion exact)") =
    forAll(
      Gen.listOfN(10, Gen.choose(0L, 72L)),
      Gen.listOfN(6, for {
        s <- Gen.choose(0L, 48L); len <- Gen.choose(1L, 24L)
      } yield (s, s + len))) { (points, intervals) =>
      import spark.implicits._
      def ts(h: Long) = new java.sql.Timestamp(1700000000000L + h * 3600000L)
      val l = points.zipWithIndex.map { case (h, i) => (i.toLong, ts(h)) }
        .toDF("l_id", "l_ts")
      val r = intervals.zipWithIndex.map { case ((s, e), i) => (i.toLong, ts(s), ts(e)) }
        .toDF("r_id", "r_start", "r_end")
      val bucketed = Relational.rangeJoin(l, "l_ts", r, "r_start", "r_end",
        bucketSeconds = 7200)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      val naive = l.crossJoin(r)
        .filter($"l_ts" >= $"r_start" && $"l_ts" < $"r_end")
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      bucketed == naive
    }

  property("asofJoin picks the latest right row at or before each left ts") =
    forAll(
      Gen.listOfN(6, for { k <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 50L) } yield (k, t)),
      Gen.listOfN(6, for { k <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 50L) } yield (k, t))) {
      (ls, rs) =>
        import spark.implicits._
        def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000L)
        val rsu = rs.distinct // right must be unique per (key, ts)
        val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, ts(t)) }
          .toDF("lid", "k", "ts")
        val right = rsu.map { case (k, t) => (k, ts(t), t) }
          .toDF("k", "ts", "rval")
        val got = Relational.asofJoin(left, right, "k", "ts")
          .select("lid", "rval").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .toMap
        ls.zipWithIndex.forall { case ((k, t), i) =>
          val expect = rsu.filter(r => r._1 == k && r._2 <= t)
            .map(_._2).sorted.lastOption
          got(i.toLong) == expect
        }
    }

  property("sessionize: per-user ids start at 1 and step by at most 1") =
    forAll(Gen.listOf(for {
      u <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 100000L)
    } yield (u, t))) { evs =>
      import spark.implicits._
      val df = evs.zipWithIndex.map { case ((u, t), i) =>
        (i.toLong, u, new java.sql.Timestamp(t * 1000L))
      }.toDF("event_id", "user_id", "ts")
      val out = graft.operators.Sessions.sessionize(df, gapSeconds = 600)
        .select("user_id", "ts", "event_id", "session_id")
        .collect().map(r => (r.getLong(0), (r.getTimestamp(1).getTime,
          r.getLong(2)), r.getLong(3)))
      out.groupBy(_._1).values.forall { g =>
        val ids = g.sortBy(_._2).map(_._3).toSeq
        ids.headOption.forall(_ == 1L) &&
          ids.sliding(2).forall {
            case Seq(a, b) => b == a || b == a + 1; case _ => true
          }
      }
    }

  property("dedupSegments: kept multiset = distinct corpus segments") =
    forAll(Gen.listOfN(5, Gen.listOf(Gen.oneOf("x", "y", "z", "w"))
      .map(_.mkString("|")))) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.operators.Dedup.dedupSegments(docs, sep = "|")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3)))
      val segsOf = texts.map(_.split("\\|", -1).toSeq)
      // per doc: segment count preserved; kept text is a subsequence
      out.forall { case (id, nSeg, nKept, kept) =>
        val orig = segsOf(id.toInt)
        val keptSeq = if (kept.isEmpty && nKept == 0) Seq.empty
                      else kept.split("\\|", -1).toSeq
        nSeg == orig.size && nKept == keptSeq.size &&
          isSubsequence(keptSeq, orig)
      } && {
        // union of kept segments across the corpus = distinct segments
        val keptAll = out.flatMap { case (_, _, nk, kept) =>
          if (nk == 0) Seq.empty else kept.split("\\|", -1).toSeq }
        keptAll.length == keptAll.distinct.length &&
          keptAll.toSet == segsOf.flatten.toSet
      }
    }

  private def isSubsequence(sub: Seq[String], full: Seq[String]): Boolean = {
    var i = 0
    for (s <- full) if (i < sub.length && sub(i) == s) i += 1
    i == sub.length
  }

  // MinKLongs laws are pure buffer arithmetic — no Spark jobs, so they
  // get the full default example budget via their own forAll sizes.
  private def minkModel(k: Int, xs: Seq[Long]): Seq[Long] =
    xs.distinct.sorted.take(k)

  property("MinKLongs: any reduce/merge tree = k smallest distinct") =
    forAll(Gen.choose(1, 6), Gen.listOf(Gen.choose(-50L, 50L)),
      Gen.choose(0, 5)) { (k, xs, cut0) =>
      val agg = new graft.functions.MinKLongs(k)
      val linear = xs.foldLeft(agg.zero)(agg.reduce)
      // arbitrary split + merge (partition layout independence)
      val cut = if (xs.isEmpty) 0 else cut0 % (xs.length + 1)
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      val model = minkModel(k, xs)
      linear.toSeq == model && merged.toSeq == model &&
        linear.length <= k && merged.length <= k
    }

  property("MinKLongs merge is commutative") =
    forAll(Gen.choose(1, 5), Gen.listOf(Gen.choose(0L, 30L)),
      Gen.listOf(Gen.choose(0L, 30L))) { (k, xs, ys) =>
      val agg = new graft.functions.MinKLongs(k)
      val bx = xs.foldLeft(agg.zero)(agg.reduce)
      val by = ys.foldLeft(agg.zero)(agg.reduce)
      agg.merge(bx.clone(), by).toSeq == agg.merge(by.clone(), bx).toSeq
    }

  property("editDistancePairs equals the brute-force levenshtein join") =
    forAll(
      Gen.listOfN(8, Gen.choose(0, 6).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))),
      Gen.choose(0, 2)) { (texts, k) =>
      import spark.implicits._
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val expect = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        d = lev(ta, tb) if d <= k
      } yield (ia, ib, d.toLong)).sorted
      val got = graft.operators.Dedup.editDistancePairs(
        docs.toDF("doc_id", "text"), k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
      got == expect
    }

  property("pageRank equals the single-threaded integer model") =
    forAll(
      Gen.listOf(for {
        a <- Gen.choose(0L, 7L); b <- Gen.choose(0L, 7L) if a != b
      } yield (math.min(a, b), math.max(a, b))),
      Gen.choose(1, 3)) { (rawPairs, iters) =>
      import spark.implicits._
      val pairs = rawPairs.distinct
      val nodes = (0L to 7L).toList
      // reference model: same integer update rule, sequential
      val ed = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val deg = ed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var pr = nodes.map(_ -> 1000000L).toMap
      (1 to iters).foreach { _ =>
        val in = ed.groupBy(_._2).view.mapValues(
          _.map { case (src, _) => pr(src) / deg(src) }.sum).toMap
        pr = nodes.map(n => n -> (150000L + 85L * in.getOrElse(n, 0L) / 100L)).toMap
      }
      val edges = ed.toDF("src", "dst")
      val got = graft.operators.Graph.pageRank(edges, nodes.toDF("doc_id"),
        iters = iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == pr
    }

  property("asofJoin tolerance: bounded result = unbounded with stale " +
      "matches nulled; huge tolerance = unbounded") =
    forAll(Gen.listOfN(5, for {
      u <- Gen.choose(1L, 3L); d <- Gen.choose(1, 20)
    } yield (u, d)), Gen.listOfN(4, for {
      u <- Gen.choose(1L, 3L); d <- Gen.choose(1, 20)
    } yield (u, d)), Gen.choose(1, 10)) { (ls, rs0, tolDays) =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      // right unique per (key, ts) by construction
      val rs = rs0.distinct
      val left = ls.zipWithIndex
        .map { case ((u, d), i) => (i.toLong, u, f"2024-01-$d%02d 00:00:00") }
        .toDF("event_id", "user_id", "ts")
        .withColumn("ts", col("ts").cast("timestamp"))
      val right = rs
        .map { case (u, d) => (u, f"2024-01-$d%02d 00:00:00", s"v$u-$d") }
        .toDF("user_id", "ts", "tag")
        .withColumn("ts", col("ts").cast("timestamp"))
      def run(tol: Option[String]) =
        Relational.asofJoin(left, right, "user_id", "ts", tol)
          .select("event_id", "tag").collect()
          .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      val unbounded = run(None)
      val bounded = run(Some(s"$tolDays days"))
      val expect = unbounded.map { case (eid, tag) =>
        eid -> tag.filter { t =>
          val ld = ls(eid.toInt)._2
          val rd = t.split("-")(1).toInt
          ld - rd <= tolDays // whole-day timestamps: staleness in days
        }
      }
      bounded == expect && run(Some("365 days")) == unbounded
    }

  property("trimmedStats: n_used matches the permille trim rule exactly") =
    forAll(Gen.listOf(for {
      g <- Gen.oneOf("a", "b"); v <- Gen.choose(-100, 100)
    } yield (g, v)), Gen.choose(0, 300), Gen.choose(0, 300)) {
      (xs0, lo, hi) =>
      import spark.implicits._
      val xs = xs0.zipWithIndex.map { case ((g, v), i) =>
        (g, v.toDouble, i.toLong) }
      xs.isEmpty || {
        val got = graft.operators.Relational.trimmedStats(
          xs.toDF("event_type", "value", "event_id"),
          lowPermille = lo, highPermille = hi)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        got.forall { case (g, nTotal, nUsed) =>
          val n = xs.count(_._1 == g).toLong
          val expect = math.max(0L, n - n * lo / 1000 - n * hi / 1000)
          nTotal == n && nUsed == expect
        }
      }
    }

  property("kmvOverlapEstimate is symmetric: swapping sides swaps the " +
      "side estimates and fixes union/intersection") =
    forAll(Gen.listOf(Gen.choose(0L, 200L)), Gen.listOf(Gen.choose(0L, 200L))) {
      (as, bs) =>
      import spark.implicits._
      (as.nonEmpty && bs.nonEmpty) ==> {
        val a = as.toDF("key")
        val b = bs.toDF("key")
        val ab = Relational.kmvOverlapEstimate(a, b, "key", "key", k = 16)
          .collect().head
        val ba = Relational.kmvOverlapEstimate(b, a, "key", "key", k = 16)
          .collect().head
        ab.getDouble(1) == ba.getDouble(2) && ab.getDouble(2) == ba.getDouble(1) &&
          ab.getDouble(3) == ba.getDouble(3) && ab.getDouble(4) == ba.getDouble(4) &&
          ab.getLong(5) == ba.getLong(5)
      }
    }

  property("zorderLayout: Morton code is a bijection of the cell pair and " +
      "bucket is its prefix — invariant under input partitioning") =
    forAll(Gen.listOfN(12,
      for { x <- Gen.choose(0L, 500L); y <- Gen.choose(0L, 500L) } yield (x, y)),
      Gen.choose(1, 8)) { (pts, parts) =>
      import graft.operators.Layout
      import spark.implicits._
      pts.nonEmpty ==> {
        val df = pts.toDF("x", "y")
        val out = Layout.zorderLayout(df, "x", "y",
          nBuckets = 16, bitsPerDim = 4)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getLong(2), r.getLong(3)))
        val rep = Layout.zorderLayout(df.repartition(parts), "x", "y",
          nBuckets = 16, bitsPerDim = 4)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getLong(2), r.getLong(3)))
        // partition-invariant assignment
        out.sorted.toSeq == rep.sorted.toSeq &&
          // zval in range, bucket = top-4-bit prefix
          out.forall { case (_, _, z, bkt) =>
            z >= 0 && z < 256 && bkt == (z >> 4)
          } &&
          // identical points -> identical codes (function of the pair)
          out.groupBy(p => (p._1, p._2)).values
            .forall(g => g.map(p => (p._3, p._4)).distinct.length == 1)
      }
    }

  // small shared vocabulary -> dense shingle overlap, so random corpora
  // actually produce near-dup pairs instead of vacuous empty results
  private val docGen: Gen[String] =
    Gen.listOfN(7, Gen.oneOf("alpha", "beta", "gamma", "delta", "x"))
      .map(_.mkString(" "))

  property("ppjoinPairs equals the brute-force exact Jaccard join") =
    forAll(Gen.listOfN(7, docGen), Gen.oneOf(0.3, 0.5, 0.8)) { (texts, t) =>
      import graft.operators.Dedup
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      val exact = Dedup.ngramJaccardPairs(docs, n = 3, threshold = t,
        maxShingleDF = None).collect().map(r => (r.getLong(0), r.getLong(1)))
      val pp = Dedup.ppjoinPairs(docs, n = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      pp.sorted.toSeq == exact.sorted.toSeq
    }

  property("triangleCounts equals naive enumeration; 3 corners per triangle") =
    forAll(Gen.listOf(
      for { a <- Gen.choose(1L, 7L); b <- Gen.choose(1L, 7L) } yield (a, b))) {
      edgeList =>
      import graft.operators.Graph
      import spark.implicits._
      val und = edgeList.filter(e => e._1 != e._2)
        .map(e => (e._1 min e._2, e._1 max e._2)).distinct.toSet
      val nodes = (1L to 7L).toList
      val naive = (for {
        x <- nodes; y <- nodes if x < y; z <- nodes if y < z
        if und((x, y)) && und((y, z)) && und((x, z))
      } yield Seq(x, y, z)).flatten
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val edges = edgeList.toDF("src", "dst")
      val out = Graph.triangleCounts(edges, nodes.toDF("doc_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      nodes.forall(n => out(n) == naive.getOrElse(n, 0L)) &&
        out.values.sum % 3 == 0
    }

  property("graft_hilbert is a neighbor-contiguous bijection at every " +
      "bit width") =
    forAll(Gen.choose(1, 4)) { bits =>
      import org.apache.spark.sql.functions.{col, expr}
      import spark.implicits._
      val n = 1L << bits
      val pts = (for { x <- 0L until n; y <- 0L until n } yield (x, y)).toList
      val out = pts.toDF("x", "y")
        .select(col("x"), col("y"),
          expr(s"graft_hilbert(x, y, $bits)").as("d"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._3)
      // bijection onto [0, 4^bits) and every consecutive pair of curve
      // positions is a grid neighbor — together these CHARACTERIZE a
      // space-filling curve of Hilbert type
      out.map(_._3).toSeq == (0L until n * n) &&
        out.sliding(2).forall { case Array((x1, y1, _), (x2, y2, _)) =>
          (x1 - x2).abs + (y1 - y2).abs == 1
        }
    }

  property("calibrationCurve equals naive equal-width binning") =
    forAll(Gen.nonEmptyListOf(
      for { s <- Gen.choose(0L, 20L); y <- Gen.oneOf(true, false) }
        yield (s, y)), Gen.choose(1, 6)) { (data, buckets) =>
      import graft.operators.Curation
      import spark.implicits._
      val lo = data.map(_._1).min
      val hi = data.map(_._1).max
      val naive = data.groupBy { case (s, _) =>
        (s - lo) * buckets / (hi - lo + 1)
      }.map { case (bin, rows) =>
        val n = rows.size.toLong
        val p = rows.count(_._2).toLong
        bin -> (rows.map(_._1).min, rows.map(_._1).max, n, p, p * 1000 / n)
      }
      val out = Curation.calibrationCurve(
        data.toDF("score", "label"), "score", "label", buckets)
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5))).toMap
      out == naive
    }

  property("joinAdvisor decision matches the naive rule on random frames") =
    forAll(Gen.nonEmptyListOf(Gen.choose(1L, 5L)),
      Gen.nonEmptyListOf(Gen.choose(1L, 5L)),
      Gen.choose(1L, 12L)) { (lk, rk, budget) =>
      import graft.operators.Relational
      import spark.implicits._
      def top(ks: List[Long]) =
        ks.groupBy(identity).values.map(_.size.toLong).max
      val tsl = top(lk) * 1000 / lk.size
      val tsr = top(rk) * 1000 / rk.size
      val want =
        if (rk.size <= budget) "broadcast_right"
        else if (lk.size <= budget) "broadcast_left"
        else if (math.max(tsl, tsr) >= 200) "salted_shuffle"
        else "shuffle"
      val row = Relational.joinAdvisor(lk.toDF("k"), rk.toDF("k"), "k", "k",
        broadcastMaxRows = budget, skewPermille = 200).collect().head
      row.getLong(0) == lk.size && row.getLong(1) == rk.size &&
        row.getLong(2) == tsl && row.getLong(3) == tsr &&
        row.getString(4) == want
    }

  property("graft_hyperplane_sig bit p = sign of the closed-form plane dot " +
      "on random vectors") =
    forAll(Gen.listOfN(8,
      Gen.listOfN(16, Gen.choose(-1000, 1000).map(_ / 250.0f)))) { vecs =>
      import org.apache.spark.sql.functions.expr
      import graft.operators.Similarity
      import spark.implicits._
      val total = 24
      val sigs = vecs.map(_.toArray).toDF("embedding")
        .select(expr(s"graft_hyperplane_sig(embedding, $total, 16)").as("s"))
        .collect().map(_.getLong(0))
      sigs.zip(vecs).forall { case (sig, v) =>
        (0 until total).forall { p =>
          val dot = (0 until 16).foldLeft(0.0) { (acc, d) =>
            acc + v(d).toDouble * Similarity.planeComponent(p, d)
          }
          (((sig >> p) & 1L) == 1L) == (dot > 0)
        }
      }
    }

  property("weightedSample equals the naive ghost-copy computation on " +
      "random weights") =
    forAll(Gen.nonEmptyListOf(
      for { id <- Gen.choose(1L, 30L); w <- Gen.choose(-2, 100) }
        yield (id, w)), Gen.choose(1, 4)) { (raw, k) =>
      import graft.operators.Curation
      import spark.implicits._
      val data = raw.distinctBy(_._1) // ids unique by contract
      def mix(id: Long, r: Int): Long = {
        var acc = 0L
        s"$id:$r".foreach(c => acc = (acc * 31 + c.toLong) % 1000000007L)
        (1103515245L * acc + 12345L) % 1000000007L
      }
      val naive = data.map { case (id, w) =>
        val wc = math.min(math.max(w, 1), 64)
        (id, wc.toLong, (1 to wc).map(mix(id, _)).max)
      }.sortBy { case (id, _, key) => (-key, id) }
        .take(k).zipWithIndex
        .map { case ((id, wc, _), i) => Seq[Any]("g", id, wc, i + 1L) }
      val out = Curation.weightedSample(
        data.map { case (id, w) => (id, "g", w) }
          .toDF("doc_id", "source", "w"),
        k = k, weightCol = "w").orderBy("rank")
        .collect().toSeq.map(r => (0 until r.length).map(i => r.get(i)))
      out == naive
    }

  property("classifierAuc equals the naive pairwise wins/ties count") =
    forAll(Gen.listOf(
      for { s <- Gen.choose(0L, 4L); y <- Gen.oneOf(true, false) }
        yield (s, y))) { data =>
      import graft.operators.Curation
      import spark.implicits._
      data.nonEmpty ==> {
        val pos = data.filter(_._2).map(_._1)
        val neg = data.filterNot(_._2).map(_._1)
        val wins = pos.map(p => neg.count(p > _).toLong).sum
        val ties = pos.map(p => neg.count(p == _).toLong).sum
        val row = Curation.classifierAuc(
          data.toDF("score", "label"), "score", "label").collect().head
        row.getLong(0) == pos.size && row.getLong(1) == neg.size &&
          row.getLong(2) == ties && {
            if (pos.isEmpty || neg.isEmpty) row.isNullAt(3)
            else row.getLong(3) ==
              (2 * wins + ties) * 1000000L / (2L * pos.size * neg.size)
          }
      }
    }

  property("lshLayout: modeled recall clears the target at the evaluation " +
      "point; planes never decrease with the threshold") =
    forAll(Gen.choose(0.05, 0.95), Gen.choose(0.05, 0.95)) { (t1, t2) =>
      import graft.operators.Similarity
      def recallAt(threshold: Double, planes: Int, tables: Int): Double = {
        val cEval = if (threshold < 0.6) threshold else (1.0 + threshold) / 2.0
        val q = 1.0 - math.acos(cEval) / math.Pi
        1.0 - math.pow(1.0 - math.pow(q, planes), tables)
      }
      val (lo, hi) = if (t1 <= t2) (t1, t2) else (t2, t1)
      val (pLo, lLo) = Similarity.lshLayout(lo)
      val (pHi, lHi) = Similarity.lshLayout(hi)
      // within the 63-bit budget, the recall target holds at the layout's
      // own evaluation point, and a tighter contract never gets SHALLOWER
      // banding (more-similar pairs survive deeper pruning, so the
      // derivation can only add planes as the threshold rises)
      pLo * lLo <= 63 && pHi * lHi <= 63 &&
        recallAt(lo, pLo, lLo) >= 0.95 && recallAt(hi, pHi, lHi) >= 0.95 &&
        pLo <= pHi
    }

  property("ksDrift equals the naive exact CDF computation") =
    forAll(Gen.listOf(Gen.chooseNum(-3L, 3L)),
      Gen.listOf(Gen.chooseNum(-3L, 3L))) { (a, b) =>
      import graft.operators.Curation
      import spark.implicits._
      val na = a.size.toLong
      val nb = b.size.toLong
      val values = (a ++ b).distinct.sorted
      val naiveCross = values.map { v =>
        val cumA = a.count(_ <= v).toLong
        val cumB = b.count(_ <= v).toLong
        (cumA * nb - cumB * na).abs
      } match { case Nil => 0L; case xs => xs.max }
      val out = Curation.ksDrift(a.toDF("v"), b.toDF("v"), "v")
        .collect().head
      out.getLong(0) == na && out.getLong(1) == nb &&
        out.getLong(2) == values.size.toLong &&
        out.getLong(3) == naiveCross && {
          if (na == 0 || nb == 0) out.isNullAt(4)
          else out.getLong(4) == naiveCross * 1000000L / (na * nb)
        }
    }

  property("chi2Drift equals the naive exact cell computation") =
    forAll(Gen.listOf(Gen.oneOf("x", "y", "z")),
      Gen.listOf(Gen.oneOf("x", "y", "z", "w"))) { (a, b) =>
      import graft.operators.Curation
      import spark.implicits._
      val na = BigInt(a.size)
      val nb = BigInt(b.size)
      val cats = (a ++ b).distinct
      val ss = cats.map { c =>
        val ca = BigInt(a.count(_ == c))
        val cb = BigInt(b.count(_ == c))
        val d = ca * nb - cb * na
        (d * d) / (ca + cb)
      }.sum
      val out = Curation.chi2Drift(a.toDF("c"), b.toDF("c"), "c")
        .collect().head
      out.getLong(0) == a.size.toLong && out.getLong(1) == b.size.toLong &&
        out.getLong(2) == cats.size.toLong && {
          if (a.isEmpty || b.isEmpty) out.isNullAt(3)
          else BigInt(out.getLong(3)) == (ss * 1000000) / (na * nb)
        }
    }

  property("chi2Cells contributions bracket chi2Drift within the " +
      "documented n_cells floor loss") =
    forAll(Gen.listOf(Gen.oneOf("x", "y", "z")),
      Gen.listOf(Gen.oneOf("x", "y", "z", "w"))) { (a, b) =>
      import graft.operators.Curation
      import spark.implicits._
      val cells = Curation.chi2Cells(a.toDF("c"), b.toDF("c"), "c")
        .collect()
      val drift = Curation.chi2Drift(a.toDF("c"), b.toDF("c"), "c")
        .collect().head
      if (a.isEmpty || b.isEmpty) cells.forall(_.isNullAt(3))
      else {
        // per-cell floors can only lose: Σ floors <= chi2 <= Σ + n_cells
        val sumC = cells.map(_.getLong(3)).sum
        val chi = drift.getLong(3)
        sumC <= chi && chi <= sumC + cells.length
      }
    }

  property("groupedTrend equals the naive exact least-squares slope") =
    forAll(Gen.listOf(for {
      g <- Gen.oneOf("p", "q"); x <- Gen.chooseNum(0L, 9L)
      y <- Gen.chooseNum(-9L, 9L)
    } yield (g, x, y))) { rowsIn =>
      import graft.operators.Relational
      import spark.implicits._
      def fdiv(a: BigInt, b: BigInt): BigInt = {
        val q = a / b
        if (a.signum * b.signum < 0 && q * b != a) q - 1 else q
      }
      val expected = rowsIn.groupBy(_._1).map { case (g, rs) =>
        val n = BigInt(rs.size)
        val sx = rs.map(r => BigInt(r._2)).sum
        val sy = rs.map(r => BigInt(r._3)).sum
        val sxx = rs.map(r => BigInt(r._2) * r._2).sum
        val sxy = rs.map(r => BigInt(r._2) * r._3).sum
        val num = n * sxy - sx * sy
        val den = n * sxx - sx * sx
        (g, rs.size.toLong, den.toLong,
          if (den > 0) Some(fdiv(num * 1000000, den).toLong) else None)
      }.toSet
      val got = Relational
        .groupedTrend(rowsIn.toDF("g", "x", "y"), "g", "x", "y")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      got == expected
    }

  property("madOutliers equals the naive two-pass median computation") =
    forAll(Gen.listOf(for {
      g <- Gen.oneOf("p", "q"); v <- Gen.chooseNum(-3L, 3L)
    } yield (g, v))) { rowsIn =>
      import graft.operators.Relational
      import spark.implicits._
      val idx = rowsIn.zipWithIndex.map { case ((g, v), i) =>
        (g, i.toLong, v * 1000000L)
      }
      def medAt(sorted: Seq[Long]): Long = {
        val n = sorted.size.toLong
        val rk = math.max(1L, (500L * n + 999L) / 1000L)
        sorted((rk - 1).toInt)
      }
      val expected = idx.groupBy(_._1).flatMap { case (g, rs) =>
        val med = medAt(rs.sortBy(r => (r._3, r._2)).map(_._3))
        val devs = rs.map(r => (r._2, (r._3 - med).abs))
        val mad = medAt(devs.sortBy(d => (d._2, d._1)).map(_._2))
        rs.filter(r => (r._3 - med).abs * 1000L > 5190L * mad)
          .map(r => (g, r._2, r._3, med, mad))
      }.toSet
      val df = idx.map { case (g, i, vm) => (g, i, vm / 1000000.0) }
        .toDF("g", "id", "v")
      val got = Relational.madOutliers(df, "g", "v", "id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      got == expected
    }

  property("kAnonymityAudit equals the naive group census") =
    forAll(Gen.listOf(for {
      q1 <- Gen.oneOf("a", "b", "c"); q2 <- Gen.chooseNum(0L, 2L)
    } yield (q1, q2)), Gen.chooseNum(1L, 5L)) { (rowsIn, k) =>
      import graft.operators.Curation
      import spark.implicits._
      rowsIn.nonEmpty ==> {
        val groups = rowsIn.groupBy(identity).values.map(_.size.toLong)
        val below = groups.filter(_ < k)
        val out = Curation.kAnonymityAudit(
          rowsIn.toDF("qt", "qz"), Seq("qt", "qz"), k).collect().head
        out.getLong(0) == rowsIn.size.toLong &&
          out.getLong(1) == groups.size.toLong &&
          out.getLong(2) == below.size.toLong &&
          out.getLong(3) == below.sum &&
          out.getLong(4) == below.sum * 1000L / rowsIn.size
      }
    }

  property("tClosenessAudit equals the naive variational-distance census") =
    forAll(Gen.listOf(for {
      q <- Gen.oneOf("a", "b"); s <- Gen.oneOf("x", "y", "z")
    } yield (q, s)), Gen.chooseNum(0L, 600000L)) { (rowsIn, t) =>
      import graft.operators.Curation
      import spark.implicits._
      rowsIn.nonEmpty ==> {
        val n = rowsIn.size.toLong
        val glob = rowsIn.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val classes = rowsIn.groupBy(_._1)
        val dists = classes.values.map { rs =>
          val nc = rs.size.toLong
          val cs = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
          val num = glob.map { case (sv, ns) =>
            (BigInt(cs.getOrElse(sv, 0L)) * n - BigInt(ns) * nc).abs }.sum
          ((num * 1000000 / (BigInt(2) * nc * n)).toLong, nc)
        }.toSeq
        val above = dists.filter(_._1 > t)
        val out = Curation.tClosenessAudit(
          rowsIn.toDF("q", "s"), Seq("q"), "s", t).collect().head
        out.getLong(0) == n &&
          out.getLong(1) == classes.size.toLong &&
          out.getLong(2) == above.size.toLong &&
          out.getLong(3) == above.map(_._2).sum &&
          out.getLong(4) == above.map(_._2).sum * 1000L / n &&
          out.getLong(5) == dists.map(_._1).max
      }
    }

  property("charEntropyMicro is invariant under permutation and " +
      "replication") =
    forAll(Gen.alphaNumStr.map(_.take(12)), Gen.chooseNum(1, 4)) { (s, k) =>
      import graft.plans.CharEntropyMicro.entropyMicro
      // permutation: counts are order-free. replication: (k·c)/(k·n) and
      // ln((k·n)/(k·c)) hit the SAME rational values, and IEEE rounds a
      // rational identically however it is written — so even the floored
      // micro terms match exactly, not just approximately.
      val e = entropyMicro(s)
      entropyMicro(s.reverse) == e &&
        entropyMicro(new String(s.toArray.sorted)) == e &&
        entropyMicro(s * k) == e
    }

  property("removeDuplicatedSpans: clean tokens are a subsequence of " +
      "the original, the globally-lowest id never loses tokens, and " +
      "counts reconcile") =
    forAll(Gen.listOfN(5, Gen.listOfN(10, Gen.oneOf("a", "b", "c", "d"))),
      Gen.chooseNum(2, 4)) { (docToks, w) =>
      import graft.operators.Dedup
      import spark.implicits._
      val docs = docToks.zipWithIndex.map { case (ts, i) =>
        (i.toLong, ts.mkString(" ")) }
      val out = Dedup.removeDuplicatedSpans(docs.toDF("doc_id", "text"),
        w = w).orderBy("doc_id").collect()
      def isSubseq(sub: Seq[String], sup: Seq[String]): Boolean = {
        var i = 0
        for (t <- sup if i < sub.size && sub(i) == t) i += 1
        i == sub.size
      }
      out.forall { r =>
        val orig = docToks(r.getLong(0).toInt)
        val clean = r.getString(3).split(" ").filter(_.nonEmpty).toSeq
        r.getLong(1) == orig.size.toLong &&
          r.getLong(2) == (orig.size - clean.size).toLong &&
          isSubseq(clean, orig)
      } &&
        // doc 0 is the global min id: it owns every duplicated window
        // it holds, so the rewrite never touches it
        out.head.getLong(2) == 0L
    }

  property("removeDuplicatedSpans equals the in-memory text-exact " +
      "reference (ownership by actual window string, lowest id wins)") =
    forAll(Gen.listOfN(6, Gen.listOfN(9, Gen.oneOf("a", "b", "c"))),
      Gen.chooseNum(2, 4)) { (docToks, w) =>
      import graft.operators.Dedup
      import spark.implicits._
      val docs = docToks.zipWithIndex.map { case (ts, i) =>
        (i.toLong, ts.mkString(" ")) }
      // reference: group windows by their TEXT, min/max doc id per text
      val owners = scala.collection.mutable.Map[String, (Long, Long)]()
      for ((id, ts) <- docs.map(d => (d._1, docToks(d._1.toInt)));
           i <- 0 to ts.size - w) {
        val key = ts.slice(i, i + w).mkString(" ")
        owners(key) = owners.get(key) match {
          case None => (id, id)
          case Some((a, b)) => (math.min(a, id), math.max(b, id))
        }
      }
      val want = docs.map { case (id, _) =>
        val ts = docToks(id.toInt)
        val rem = (for {
          i <- 0 to ts.size - w
          (mn, mx) = owners(ts.slice(i, i + w).mkString(" "))
          if mn != mx && id != mn
          p <- i until i + w
        } yield p).toSet
        val clean = ts.zipWithIndex.collect {
          case (t, j) if !rem(j) => t }.mkString(" ")
        Seq(id, ts.size.toLong, rem.size.toLong, clean)
      }
      val got = Dedup.removeDuplicatedSpans(docs.toDF("doc_id", "text"),
          w = w).orderBy("doc_id").collect().toSeq.map(_.toSeq)
      got == want
    }

  property("graft_span_cover = sorted distinct flatten of the per-start " +
      "sequences, for any starts (unsorted input sorted by the caller, " +
      "duplicates tolerated)") =
    forAll(Gen.listOf(Gen.chooseNum(1, 30)), Gen.chooseNum(2, 5)) {
      (starts, w) =>
      import spark.implicits._
      val df = Seq(Tuple1(starts)).toDF("s")
      val got = df.select(
          org.apache.spark.sql.functions.expr(
            s"graft_span_cover(array_sort(s), $w)").as("c"))
        .head().getSeq[Int](0).toList
      val want = starts.flatMap(i => i until i + w).distinct.sorted
      got == want
    }

  property("removeRepeatedSpansWithinDoc equals the in-memory reference " +
      "(first in-doc start owns, later occurrences drop)") =
    forAll(Gen.listOfN(4, Gen.listOfN(12, Gen.oneOf("a", "b"))),
      Gen.chooseNum(2, 4)) { (docToks, w) =>
      import graft.operators.Dedup
      import spark.implicits._
      val docs = docToks.zipWithIndex.map { case (ts, i) =>
        (i.toLong, ts.mkString(" ")) }
      val want = docs.map { case (id, _) =>
        val ts = docToks(id.toInt)
        val first = scala.collection.mutable.Map[String, Int]()
        val rem = scala.collection.mutable.Set[Int]()
        for (j <- 0 to ts.size - w) {
          val key = ts.slice(j, j + w).mkString(" ")
          first.get(key) match {
            case None => first(key) = j
            case Some(_) => (j until j + w).foreach(rem += _)
          }
        }
        val clean = ts.zipWithIndex.collect {
          case (tk, j) if !rem(j) => tk }.mkString(" ")
        Seq(id, ts.size.toLong, rem.size.toLong, clean)
      }
      val got = Dedup.removeRepeatedSpansWithinDoc(
          docs.toDF("doc_id", "text"), w = w)
        .orderBy("doc_id").collect().toSeq.map(_.toSeq)
      got == want
    }

  property("budgetSelect preThin = plain for any rows, ties, budget, " +
      "cost signs, and self-gate threshold (the thin is exact, never " +
      "best-effort; the round-17 count gate only skips work)") =
    forAll(
      Gen.listOfN(40, for {
        g <- Gen.oneOf("a", "b", "c")
        s <- Gen.chooseNum(-5, 5)
        c <- Gen.chooseNum(-3L, 10L)
      } yield (g, s.toDouble, c)),
      Gen.chooseNum(0L, 30L),
      Gen.chooseNum(0L, 50L)) { (rows0, budget, minRows) =>
      import spark.implicits._
      import graft.operators.Curation
      val df = rows0.zipWithIndex.map { case ((g, s, c), i) =>
        (g, s, c, i.toLong) }.toDF("grp", "score", "cost", "doc_id")
      def run(p: Boolean) = Curation.budgetSelect(df, "grp", "score",
          "cost", budget, preThin = p, preThinMinRows = minRows)
        .orderBy("grp", "pick_rank").collect().toSeq.map(_.toSeq)
      run(true) == run(false)
    }

  property("graft_nearest_cell = the HOF argmax chain on random/degenerate " +
      "vectors (ties, length mismatch, null elements, null vectors)") =
    forAll(
      // centroids on a coarse grid so duplicate rows (ties) arise often
      Gen.choose(1, 5).flatMap(nlist => Gen.listOfN(nlist,
        Gen.listOfN(3, Gen.choose(-2, 2).map(_ / 2.0)))),
      Gen.listOfN(8, Gen.frequency(
        (1, Gen.const(null: List[java.lang.Float])),
        (1, Gen.const(List[java.lang.Float]())), // length mismatch
        (1, Gen.listOfN(2,                       // length mismatch
          Gen.choose(-4, 4).map(x => java.lang.Float.valueOf(x / 2.0f)))),
        (1, Gen.listOfN(3, Gen.choose(-4, 4))    // null element
          .map(_.map(x => java.lang.Float.valueOf(x / 2.0f))
            .updated(1, null: java.lang.Float))),
        (6, Gen.listOfN(3,                       // well-formed, coarse grid
          Gen.choose(-4, 4).map(x => java.lang.Float.valueOf(x / 2.0f))))))
    ) { (cents, vecs) =>
      import org.apache.spark.sql.{functions => F, Row, types => T}
      val schema = T.StructType(Seq(T.StructField("embedding",
        T.ArrayType(T.FloatType, containsNull = true))))
      val df = spark.createDataFrame(
        vecs.map(v => Row(if (v == null) null else v.toSeq)).asJava, schema)
      val centsSql = cents
        .map(_.mkString("array(", "D, ", "D)")).mkString("array(", ", ", ")")
      // the REFERENCE chain this expression's scaladoc pins against —
      // per-centroid graft_dot transform, array_position/array_max argmax
      val chain = df.select(F.expr(
        s"""CAST(array_position(
           |  transform($centsSql, c -> graft_dot(embedding, c)),
           |  array_max(transform($centsSql, c -> graft_dot(embedding, c))))
           |AS INT)""".stripMargin).as("cell")).collect().map(r =>
        if (r.isNullAt(0)) null else r.getInt(0))
      val native = df.select(org.apache.spark.sql.GraftColumnBridge.column(
        graft.plans.NearestCell(
          org.apache.spark.sql.GraftColumnBridge.expression(F.col("embedding")),
          cents.flatten.toArray, cents.size, 3)).as("cell"))
        .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
      chain.toSeq == native.toSeq
    }

  property("graft_pq_code = the HOF slice/argmax chain on random windows " +
      "(ties, short vectors, null elements in/out of the window)") =
    forAll(
      Gen.choose(1, 4).flatMap(k => Gen.listOfN(k,
        Gen.listOfN(2, Gen.choose(-2, 2).map(_ / 2.0)))), // dsub = 2 codebook
      Gen.choose(0, 1), // subspace j (offset = 2j)
      Gen.listOfN(8, Gen.frequency(
        (1, Gen.const(null: List[java.lang.Float])),
        (1, Gen.listOfN(3,                       // too short for j = 1
          Gen.choose(-4, 4).map(x => java.lang.Float.valueOf(x / 2.0f)))),
        (1, Gen.listOfN(4, Gen.choose(-4, 4))    // null element at pos 1
          .map(_.map(x => java.lang.Float.valueOf(x / 2.0f))
            .updated(1, null: java.lang.Float))),
        (1, Gen.listOfN(4, Gen.choose(-4, 4))    // null element at pos 3
          .map(_.map(x => java.lang.Float.valueOf(x / 2.0f))
            .updated(3, null: java.lang.Float))),
        (5, Gen.listOfN(4,                       // well-formed dim 4
          Gen.choose(-4, 4).map(x => java.lang.Float.valueOf(x / 2.0f))))))
    ) { (cb, j, vecs) =>
      import org.apache.spark.sql.{functions => F, Row, types => T}
      val dsub = 2
      val bias = cb.map(c => c.foldLeft(0.0)((a, x) => a + x * x) * 0.5)
      val schema = T.StructType(Seq(T.StructField("embedding",
        T.ArrayType(T.FloatType, containsNull = true))))
      val df = spark.createDataFrame(
        vecs.map(v => Row(if (v == null) null else v.toSeq)).asJava, schema)
      val cbSql = cb.map(_.mkString("array(", "D, ", "D)"))
        .mkString("array(", ", ", ")")
      val biasSql = bias.mkString("array(", "D, ", "D)")
      val chain = df.select(F.expr(
        s"""CAST(array_position(
           |  transform(sequence(1, ${cb.size}),
           |    i -> graft_dot(slice(embedding, ${j * dsub + 1}, $dsub),
           |                   element_at($cbSql, i))
           |         - element_at($biasSql, i)),
           |  array_max(transform(sequence(1, ${cb.size}),
           |    i -> graft_dot(slice(embedding, ${j * dsub + 1}, $dsub),
           |                   element_at($cbSql, i))
           |         - element_at($biasSql, i))))
           |AS INT)""".stripMargin).as("code")).collect().map(r =>
        if (r.isNullAt(0)) null else r.getInt(0))
      val native = df.select(org.apache.spark.sql.GraftColumnBridge.column(
        graft.plans.PqCode(
          org.apache.spark.sql.GraftColumnBridge.expression(F.col("embedding")),
          cb.flatten.toArray, cb.size, dsub, j * dsub, bias.toArray)).as("code"))
        .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
      chain.toSeq == native.toSeq
    }

  property("rankingEval of any ranking against itself is perfect") =
    forAll(Gen.chooseNum(1, 5), Gen.chooseNum(1, 3)) { (k, nq) =>
      import graft.operators.Similarity
      import spark.implicits._
      val r = (1 to nq).flatMap(q => (1 to k).map(rk =>
        (q.toLong, q * 100L + rk, rk.toLong)))
        .toDF("query_id", "neighbor_id", "rank")
      val idcg = (1 to k).map(Similarity.ndcgDiscountMicro).sum
      Similarity.rankingEval(r, r, k).collect().forall { row =>
        row.getLong(1) == k.toLong && row.getLong(2) == 1000000L &&
          row.getLong(3) == idcg && row.getLong(4) == idcg &&
          row.getLong(5) == 1000L
      }
    }

  // per-query (truthCount, hitCount <= truthCount) shapes for the
  // calibration accept rule's core math (round 19)
  private val recallShape: Gen[List[(Int, Int)]] =
    Gen.listOfN(4, for {
      t <- Gen.chooseNum(1, 3)
      h <- Gen.chooseNum(0, t)
    } yield (t, h)).map(_.take(4)).suchThat(_.nonEmpty)

  property("recallStats: pooled recall is z-invariant, margin is " +
      "non-negative, linear in z, zero at z=0 and zero when every " +
      "query's recall is equal; noise rows outside the truth set " +
      "never count") =
    forAll(recallShape) { shape =>
      import graft.operators.Similarity
      import spark.implicits._
      val truth = shape.zipWithIndex.flatMap { case ((t, _), q) =>
        (0 until t).map(j => (q.toLong, q * 100L + j)) }
        .toDF("query_id", "neighbor_id")
      // got = the first h true neighbors per query + a noise row per
      // query that is NOT in the truth set (must be ignored)
      val got = shape.zipWithIndex.flatMap { case ((_, h), q) =>
        (0 until h).map(j => (q.toLong, q * 100L + j)) :+
          ((q.toLong, 999999L)) }
        .toDF("query_id", "neighbor_id")
      val denom = shape.map(_._1).sum.toDouble
      val (r0, m0) = Similarity.recallStats(got, truth, denom, 0.0)
      val (r1, m1) = Similarity.recallStats(got, truth, denom, 1.0)
      val (r2, m2) = Similarity.recallStats(got, truth, denom, 2.0)
      val pooled = shape.map(_._2).sum / denom
      val perQ = shape.map { case (t, h) => h.toDouble / t }
      val allEqual = perQ.distinct.size == 1
      math.abs(r0 - pooled) < 1e-12 &&
        math.abs(r1 - pooled) < 1e-12 && math.abs(r2 - pooled) < 1e-12 &&
        m0 == 0.0 && m1 >= 0.0 &&
        math.abs(m2 - 2 * m1) < 1e-12 &&
        (!allEqual || m1 == 0.0)
    }
}
