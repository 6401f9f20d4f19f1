package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("hashSplit: disjoint, complete, deterministic, partition-invariant") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val (train, holdout) = TextOps.hashSplit(docs, "doc_id", 10)
    val trainIds = train.select("doc_id").as[Long](spark.implicits.newLongEncoder)
      .collect().toSet
    val holdIds = holdout.select("doc_id").as[Long](spark.implicits.newLongEncoder)
      .collect().toSet
    assert(trainIds.intersect(holdIds).isEmpty)
    assert(trainIds.size + holdIds.size === docs.count())
    // ~10% holdout, hash-uniform (binomial tolerance on 500 docs)
    assert(holdIds.size > 20 && holdIds.size < 90, s"holdout=${holdIds.size}")
    // pure function of the id: same split after an arbitrary repartition
    val (_, holdout2) = TextOps.hashSplit(docs.repartition(7), "doc_id", 10)
    val holdIds2 = holdout2.select("doc_id")
      .as[Long](spark.implicits.newLongEncoder).collect().toSet
    assert(holdIds2 === holdIds)
    // a different salt draws a different (but equally valid) split
    val (_, holdout3) = TextOps.hashSplit(docs, "doc_id", 10, salt = "other")
    val holdIds3 = holdout3.select("doc_id")
      .as[Long](spark.implicits.newLongEncoder).collect().toSet
    assert(holdIds3 !== holdIds)
  }

  test("membership is stable when the corpus grows") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val half = docs.filter(col("doc_id") < 250)
    val (_, holdSmall) = TextOps.hashSplit(half, "doc_id", 10)
    val (_, holdFull) = TextOps.hashSplit(docs, "doc_id", 10)
    val small = holdSmall.select("doc_id")
      .as[Long](spark.implicits.newLongEncoder).collect().toSet
    val full = holdFull.select("doc_id")
      .as[Long](spark.implicits.newLongEncoder).collect().toSet
    assert(small === full.filter(_ < 250),
      "growing the corpus must not reassign existing docs")
  }

  test("budget sampling: selected docs stay selected as the corpus grows") {
    // prefix selection in doc_id order: appending documents (monotonic
    // ids) can only extend each language's prefix, never evict from it —
    // the curation-stability property a training-mix assembler needs
    val docs = graft.core.Tables.documents(spark, sfDir)
    val half = docs.filter(col("doc_id") < 250)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").as[Long](spark.implicits.newLongEncoder)
        .collect().toSet
    val selHalf = ids(TextOps.budgetSample(half))
    val selFull = ids(TextOps.budgetSample(docs))
    assert(selHalf === selFull.filter(_ < 250),
      "growth must not change the fate of already-selected docs")
    assert(selHalf.nonEmpty && selFull.size >= selHalf.size)
    // and the budget is respected per language on the full corpus
    val over = TextOps.budgetSample(docs)
      .filter(col("cum_tokens") > col("quota")).count()
    assert(over === 0L)
  }

  test("temperature sampling: quotas ≡ a driver model, low-resource " +
      "languages upweighted, budget respected, pow(0.5) bridge") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val B = 12000L

    // driver model: same fold order (langs ascending), same IEEE ops
    val masses = docs
      .groupBy("lang").agg(sum(size(split(col("text"), " "))).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val roots = masses.map { case (l, c) => (l, math.sqrt(c.toDouble)) }
    var total = 0.0
    roots.foreach { case (_, s) => total += s }
    val wantQuota = roots.map { case (l, s) =>
      (l, math.floor(s * B.toDouble / total).toLong) }.toMap

    val got = TextOps.temperatureQuotas(docs, B).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.map(x => (x._1, x._3)).toMap === wantQuota)

    // the point of temperature: every language's quota share must exceed
    // α=1 proportional sampling for below-average-mass languages and sit
    // below it for above-average ones (√ compresses toward the mean)
    val sumC = masses.map(_._2).sum.toDouble
    val sumQ = wantQuota.values.sum.toDouble
    masses.foreach { case (l, c) =>
      val raw = c / sumC
      val temp = wantQuota(l) / sumQ
      if (c.toDouble < sumC / masses.size) // below mean mass
        assert(temp > raw, s"$l: temperature must upweight ($temp vs $raw)")
    }
    assert(wantQuota.values.sum <= B, "floor keeps the fill under budget")

    // the fill respects quotas, selects AND excludes in every language
    val fill = TextOps.temperatureSample(docs, B)
    assert(fill.filter(col("cum_tokens") > col("quota")).count() === 0L)
    val perLang = fill.groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val allLang = docs.groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    allLang.foreach { case (l, n) =>
      assert(perLang.getOrElse(l, 0L) > 0, s"$l must select some docs")
      assert(perLang.getOrElse(l, 0L) < n, s"$l must exclude some docs")
    }

    // general-α bridge: pow at α = 0.5 reproduces the declared quotas
    val viaPow = TextOps.temperatureQuotasPow(docs, B, 0.5).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    assert(viaPow === wantQuota)
  }

  test("multi-epoch fill: pricing ≡ a driver model, low-resource repeats " +
      "+ high-resource truncates, fan-out capped, mass billed to quota") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val F = TextOps.epochRepeatFactor; val CAP = TextOps.epochCap

    // driver model of the pricing — same IEEE sequence
    val masses = docs
      .groupBy("lang").agg(sum(size(split(col("text"), " "))).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val mass = masses.map(_._2).sum
    var total = 0.0
    masses.foreach { case (_, c) => total += math.sqrt(c.toDouble) }
    val model = masses.map { case (l, c) =>
      val quota = math.floor(
        math.sqrt(c.toDouble) * (mass * F).toDouble / total).toLong
      val fullE = math.min(quota / c, CAP)
      val rem = if (fullE >= CAP) 0L else quota % c
      l -> ((c, quota, fullE, rem))
    }.toMap

    val priced = TextOps.epochQuotas(docs, F, CAP).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(priced === model)

    // the α-sampling regimes diverge on the testdata: the lowest-mass
    // language runs strictly more full passes than the highest-mass one
    // (quota/c = 2T/(√c·Σ√c) is mass-share-dependent only, so this is
    // scale-stable), and at least one language repeats
    assert(model.values.exists(_._3 >= 1L), "some language must repeat")
    val loLang = masses.minBy(_._2)._1; val hiLang = masses.maxBy(_._2)._1
    assert(model(loLang)._3 > model(hiLang)._3,
      "low-resource language must run more full passes than high-resource")

    // truncation (full_epochs == 0) and the binding cap, pinned on a
    // synthetic extreme-skew corpus: one dominant language (mass 10000)
    // over 50 small ones (mass 100 each) — Σ√c = 600 while 2T = 30000,
    // so quota_big/c_big = 0.5 (truncation) and quota_small/c_small = 5
    // (cap binds at 4)
    {
      import spark.implicits._
      val w100 = Seq.fill(100)("w").mkString(" ")
      val skew = (1L to 100L).map(i => (i, "big", w100)) ++
        (1 to 50).map(j => (100L + j, f"l$j%02d", w100))
      val df = skew.toDF("doc_id", "lang", "text")
      val q = TextOps.epochQuotas(df, F, CAP).collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      assert(q("big")._3 === 0L && q("big")._4 < q("big")._1,
        s"dominant language must truncate: ${q("big")}")
      assert(q("l01")._3 === CAP && q("l01")._4 === 0L,
        s"small language must cap: ${q("l01")}")
      val f = TextOps.epochSampleWith(df, TextOps.epochQuotas(df, F, CAP))
      assert(f.filter(col("lang") === "l01").count() === CAP,
        "capped language emits exactly cap rows for its one doc")
      assert(f.filter(col("lang") === "big").count() < 100L,
        "truncated language excludes documents")
    }

    val fill = TextOps.epochSample(docs)
    // fan-out bound: no doc appears more than cap (+1 partial never
    // coexists with a binding cap) times
    val perDoc = fill.groupBy("doc_id").count()
      .agg(max("count")).head().getLong(0)
    assert(perDoc <= CAP)
    // epochs are dense 1..n per doc
    val dense = fill.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("epoch").as("m"), min("epoch").as("lo"))
      .filter(col("n") =!= col("m") || col("lo") =!= 1L).count()
    assert(dense === 0L)
    // billed mass per lang = full_epochs·c + partial-prefix tokens ≤ quota
    // (when the cap is not binding) — the budget is respected exactly
    val billed = fill.groupBy("lang").agg(sum("n_tokens").as("b")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    model.foreach { case (l, (c, quota, fullE, rem)) =>
      if (fullE < CAP)
        assert(billed.getOrElse(l, 0L) <= quota,
          s"$l bills ${billed.getOrElse(l, 0L)} over quota $quota")
      else assert(billed(l) === CAP * c, s"$l capped bill must be CAP·c")
    }
  }

  test("epoch shard fill: frozen pricing + carried tally ≡ the batch " +
      "fill, across two shards") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text")
    val base = java.nio.file.Files
      .createTempDirectory("graft_epochfill").toString
    val statePath = base + "/state"; val quotaPath = base + "/quotas"
    TextOps.epochQuotas(docs, TextOps.epochRepeatFactor, TextOps.epochCap)
      .write.parquet(quotaPath)
    val frozen = spark.read.parquet(quotaPath)

    type R = (Long, String, Long, Long)
    def rows(df: org.apache.spark.sql.DataFrame): Set[R] =
      df.select("doc_id", "lang", "n_tokens", "epoch").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
    val all = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val half = all.length / 2
    import spark.implicits._
    val got = Seq(all.take(half), all.drop(half)).map { b =>
      rows(TextOps.epochFillShard(
        b.toSeq.toDF("doc_id", "lang", "text"), statePath, frozen))
    }.reduce(_ ++ _)
    assert(got === rows(TextOps.epochSampleWith(docs, frozen)))
    assert(got === rows(TextOps.epochSample(docs)))
  }

  test("weighted sampling (Efraimidis–Spirakis): ≡ a driver replay of " +
      "ln(u)/w top-k, and the weights genuinely shift the draw") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val k = 50
    // driver replay — same md5-16-bit u, same IEEE sequence
    val md = java.security.MessageDigest.getInstance("MD5")
    def u16(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      java.lang.Long.parseLong(hex, 16)
    }
    val base = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = base.map { case (id, w) =>
      (id, math.log((u16(id) + 1L).toDouble / 65536.0) / w.toDouble)
    }.sortBy { case (id, s) => (-s, id) }.take(k)
    val got = TextOps.weightedSample(docs, k).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.toSeq === want.toSeq)
    // weights matter: the unweighted top-k by u alone differs
    val unweighted = base.map { case (id, _) => (id, u16(id)) }
      .sortBy { case (id, u) => (-u, id) }.take(k).map(_._1).toSet
    assert(got.map(_._1).toSet !== unweighted,
      "the token-mass weight must shift the selection")

    // frozen-threshold form reproduces the top-k on the pricing corpus
    val thr = TextOps.weightedThreshold(docs, k)
    val viaThr = TextOps.weightedSampleWith(docs, thr).collect()
      .map(_.getLong(0)).toSet
    assert(viaThr === got.map(_._1).toSet)

    // streaming admission ≡ the batch filter over everything delivered
    {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      val base2 = java.nio.file.Files
        .createTempDirectory("graft_wfill").toString + "/thr"
      thr.write.parquet(base2)
      val all = docs.select("doc_id", "lang", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      val sunk = scala.collection.mutable.Set[Long]()
      val stream = MemoryStream[(Long, String, String)](183, spark, None)
      val q = graft.stream.Streaming.streamWeightedFill(
          stream.toDF().toDF("doc_id", "lang", "text"), base2,
          (df, _) => sunk ++= df.collect().map(_.getLong(0)))
        .start()
      val half = all.length / 2
      Seq(all.take(half), all.drop(half)).foreach { b =>
        stream.addData(b); q.processAllAvailable() }
      q.stop()
      assert(sunk.toSet === viaThr)
    }
  }

  test("subword token estimate: exact arithmetic, bracketed by ws tokens and chars") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val rows = docs
      .select(col("doc_id"), col("text"),
        TextOps.subwordTokenEst(col("text")).as("est"),
        size(split(col("text"), " ")).cast("long").as("ws"),
        length(col("text")).cast("long").as("chars"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (text, est, ws, chars) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // the estimate IS the documented arithmetic: Σ ceil(len(word)/4)
      val model = text.split(' ').map(w => (w.length + 3) / 4).sum.toLong
      assert(est === model, s"doc ${r.getLong(0)}")
      // every word costs ≥ 1 token; no word costs more than its chars
      assert(ws <= est && est <= chars,
        s"doc ${r.getLong(0)}: ws=$ws est=$est chars=$chars")
    }
    // the meter must actually bite: on this corpus real words are longer
    // than 4 chars often enough that the estimate strictly exceeds the
    // whitespace count somewhere (else the variant would be a no-op twin)
    assert(rows.exists(r => r.getLong(2) > r.getLong(3)))

    // the subword-metered budget keeps the growth-stability property
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").as[Long](spark.implicits.newLongEncoder)
        .collect().toSet
    val half = docs.filter(col("doc_id") < 250)
    val selHalf = ids(TextOps.budgetSampleSubword(half))
    val selFull = ids(TextOps.budgetSampleSubword(docs))
    assert(selHalf === selFull.filter(_ < 250))
    // metering subword estimates (≥ ws count per doc) can only shorten
    // each language's selected prefix relative to the ws-metered fill
    assert(selFull.subsetOf(ids(TextOps.budgetSample(docs))))
  }

  test("wordpiece-metered budget: fill ≡ a driver replay of the greedy " +
      "bill + quota selection, [UNK] words billed at one token") {
    import org.apache.spark.sql.graftexpr.WordPieceEncodeExpr
    val docs = graft.core.Tables.documents(spark, sfDir)
    val wModel = WordPiece.train(docs, 30)
    val sel = TextOps.budgetSampleWordPiece(docs, wModel).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(sel.nonEmpty)

    val table = WordPieceEncodeExpr.Vocab(wModel.vocab)
    def bill(text: String): Long =
      text.split(" ", -1).map(w => WordPieceEncodeExpr.encode(
        org.apache.spark.unsafe.types.UTF8String.fromString(w), table)
        .numElements().toLong).sum
    val all = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), bill(r.getString(2))))
    val weight = TextOps.mixWeights.toMap
    val expected = all.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      val quota = TextOps.quotaOf(
        weight.getOrElse(lang, TextOps.mixDefault))
      var cum = 0L
      rows.sortBy(_._1).flatMap { case (id, _, n) =>
        cum += n
        if (cum <= quota) Some((id, lang, n, cum, quota)) else None
      }
    }
    assert(sel.sortBy(_._1) === expected.sortBy(_._1),
      "engine fill must equal the driver replay row for row")
  }

  test("unigram-metered budget: fill ≡ a driver replay of the Viterbi " +
      "bill + quota selection, and the two tokenizer bills diverge") {
    import org.apache.spark.sql.graftexpr.UnigramEncodeExpr
    val docs = graft.core.Tables.documents(spark, sfDir)
    val uModel = Unigram.train(docs, targetMultis = 30)
    val sel = TextOps.budgetSampleUnigram(docs, uModel).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(sel.nonEmpty)

    // driver replay: the kernel's pure-JVM entry point bills each word
    val table = UnigramEncodeExpr.PieceTable(uModel.pieces)
    def bill(text: String): Long =
      text.split(" ", -1).map(w => UnigramEncodeExpr.encode(
        org.apache.spark.unsafe.types.UTF8String.fromString(w), table)
        .numElements().toLong).sum
    val all = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), bill(r.getString(2))))
    val weight = TextOps.mixWeights.toMap
    val expected = all.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      val quota = TextOps.quotaOf(
        weight.getOrElse(lang, TextOps.mixDefault))
      var cum = 0L
      rows.sortBy(_._1).flatMap { case (id, _, n) =>
        cum += n
        if (cum <= quota) Some((id, lang, n, cum, quota)) else None
      }
    }
    assert(sel.sortBy(_._1) === expected.sortBy(_._1),
      "engine fill must equal the driver replay row for row")

    // the whole point of carrying both families: their bills differ on
    // the same corpus at comparable model budgets — a budget metered in
    // the wrong tokenizer over/under-charges
    val bModel = Bpe.train(docs, 30)
    val bpeBill = TextOps.budgetSampleBpe(docs, bModel).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sel.exists { case (id, _, n, _, _) =>
      bpeBill.get(id).exists(_ != n) },
      "unigram and BPE bills must diverge somewhere on this corpus")
  }

  test("bpe-metered budget: fill ≡ an independent driver replay of the " +
      "trained tokenizer and the quota selection") {
    import org.apache.spark.sql.graftexpr.BpeEncodeExpr
    val docs = graft.core.Tables.documents(spark, sfDir)
    val model = Bpe.train(docs, 30)
    val sel = TextOps.budgetSampleBpe(docs, model).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(sel.nonEmpty)

    // driver model leg 1 — the tokenizer's own bill, replayed through
    // the kernel's pure-JVM entry point (no Spark plan involved)
    val table = BpeEncodeExpr.MergeTable(model.merges)
    def bill(text: String): Long =
      text.split(" ", -1).map(w => BpeEncodeExpr.encode(
        org.apache.spark.unsafe.types.UTF8String.fromString(w), table)
        .numElements().toLong).sum
    val all = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), bill(r.getString(2))))

    // driver model leg 2 — the quota selection: per-lang prefix in
    // doc_id order against the mixture-share quota
    val weight = TextOps.mixWeights.toMap
    val expected = all.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      val quota = TextOps.quotaOf(
        weight.getOrElse(lang, TextOps.mixDefault))
      var cum = 0L
      rows.sortBy(_._1).flatMap { case (id, _, n) =>
        cum += n
        if (cum <= quota) Some((id, lang, n, cum, quota)) else None
      }
    }
    assert(sel.sortBy(_._1) === expected.sortBy(_._1),
      "engine fill must equal the driver replay row for row")

    // the exact meter must genuinely differ from BOTH prior meters
    // somewhere, or the variant is a no-op twin
    val ws = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = docs.select(col("doc_id"),
        TextOps.subwordTokenEst(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all.exists { case (id, _, n) => n !== ws(id) })
    assert(all.exists { case (id, _, n) => n !== est(id) })

    // growth-stability carries to the exact meter (shared selection
    // mechanics): appending docs never evicts a selected one
    def ids2(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").as[Long](spark.implicits.newLongEncoder)
        .collect().toSet
    val selHalfBpe =
      ids2(TextOps.budgetSampleBpe(docs.filter(col("doc_id") < 250), model))
    assert(selHalfBpe === sel.map(_._1).toSet.filter(_ < 250))
  }

  test("streaming budget fill: union of per-batch selections ≡ the " +
      "batch fill over everything delivered; replay trips the guard") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text")
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_budgetfill").toString + "/state"
    type Row5 = (Long, String, Long, Long, Long)
    def rows(df: org.apache.spark.sql.DataFrame): Set[Row5] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val all = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val cuts = Seq(all.length / 3, 2 * all.length / 3)
    val batches = Seq(all.take(cuts(0)),
      all.slice(cuts(0), cuts(1)), all.drop(cuts(1)))

    val sunk = scala.collection.mutable.ArrayBuffer[Set[Row5]]()
    val stream = MemoryStream[(Long, String, String)](173, spark, None)
    val q = graft.stream.Streaming.streamBudgetFill(
        stream.toDF().toDF("doc_id", "lang", "text"), statePath,
        (df, _) => sunk += rows(df))
      .start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    assert(sunk.size === 3)
    // the whole point: the streamed union IS the batch fill
    assert(sunk.reduce(_ ++ _) === rows(TextOps.budgetSample(docs)),
      "per-batch selections must union to the batch fill row for row")
    // quotas eventually bind: some later batch selects strictly less
    // than it delivers
    assert(sunk.last.size < batches.last.length)

    // a replayed shard must fail loudly, not double-count the tally
    val replay = intercept[IllegalArgumentException] {
      TextOps.budgetFillShard(
        batches.head.toSeq.toDF("doc_id", "lang", "text"), statePath)
    }
    assert(replay.getMessage.contains("monotonic"))
  }

  test("streaming temperature fill: frozen quotas + carried tallies ≡ " +
      "the batch fill with the same quotas") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text")
    val base = java.nio.file.Files
      .createTempDirectory("graft_tempfill").toString
    val statePath = base + "/state"; val quotaPath = base + "/quotas"
    // freeze the pricing from the release corpus ONCE
    TextOps.temperatureQuotas(docs, 12000L)
      .select("lang", "quota").write.parquet(quotaPath)
    val frozen = spark.read.parquet(quotaPath)

    type Row5 = (Long, String, Long, Long, Long)
    def rows(df: org.apache.spark.sql.DataFrame): Set[Row5] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val all = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val half = all.length / 2
    val batches = Seq(all.take(half), all.drop(half))

    val sunk = scala.collection.mutable.ArrayBuffer[Set[Row5]]()
    val stream = MemoryStream[(Long, String, String)](179, spark, None)
    val q = graft.stream.Streaming.streamTemperatureFill(
        stream.toDF().toDF("doc_id", "lang", "text"), statePath, quotaPath,
        (df, _) => sunk += rows(df))
      .start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    assert(sunk.size === 2)
    assert(sunk.reduce(_ ++ _)
      === rows(TextOps.temperatureSampleWith(docs, frozen)),
      "per-batch selections must union to the frozen-quota batch fill")
    // and the declared query (quotas recomputed on the SAME corpus) is
    // the identical selection — one corpus, one price
    assert(sunk.reduce(_ ++ _) === rows(TextOps.temperatureSample(docs,
      12000L)))
  }

  test("Gopher repetition signals: hand-computed fractions on known " +
      "docs, short docs coalesce to 0 instead of vanishing") {
    import spark.implicits._
    // doc 1: "a b a b a b" — 6 tokens, 2 distinct; bigrams: "a b"×3,
    // "b a"×2 (top 3 of 5); trigrams: "a b a"×2, "b a b"×2 (all 4 dup)
    // doc 2: "x y z w" — all unique, no repeated gram anywhere
    // doc 3: "q" — one token: no bigrams, no trigrams
    // doc 4: "p p" — one bigram "p p" (top 1/1), no trigram
    val docs = Seq((1L, "a b a b a b"), (2L, "x y z w"), (3L, "q"),
      (4L, "p p")).toDF("doc_id", "text")
    val out = {
      // run the declared key's body on the fixture via a temp dir table
      val dir = java.nio.file.Files
        .createTempDirectory("graft_rep").toString
      docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      TextOps.queries("text_repetition")(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getBoolean(5)))).toMap
    }
    assert(out.keySet === Set(1L, 2L, 3L, 4L),
      "short docs must appear, not vanish")
    assert(out(1L) === ((1.0 - 2.0 / 6.0, 3.0 / 5.0, 4.0 / 4.0, true)))
    assert(out(2L) === ((0.0, 1.0 / 3.0, 0.0, true)))
    assert(out(3L) === ((0.0, 0.0, 0.0, false)))
    assert(out(4L) === ((0.5, 1.0, 0.0, true)))
  }

  test("fertility report: ≡ a driver replay of the kernel bill; byte " +
      "fertility strictly exceeds char on a multi-byte corpus") {
    import org.apache.spark.sql.graftexpr.BpeEncodeExpr
    import spark.implicits._
    val texts = Seq.fill(6)(("café crème", "fr")) ++
      Seq.fill(4)(("日本語 テスト", "ja")) ++
      Seq.fill(7)(("plain ascii words here", "en"))
    val docs = texts.zipWithIndex
      .map { case ((t, l), i) => (i.toLong, t, l) }
      .toDF("doc_id", "text", "lang")
    val model = Bpe.train(docs, 20)
    val got = TextOps.fertilityReportBpe(docs, model).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap

    // driver replay via the kernel's pure-JVM entry point
    val table = BpeEncodeExpr.MergeTable(model.merges)
    def bill(t: String): Long = t.split(" ", -1).map(w =>
      BpeEncodeExpr.encode(
        org.apache.spark.unsafe.types.UTF8String.fromString(w), table)
        .numElements().toLong).sum
    val want = texts.groupBy(_._2).map { case (l, rows) =>
      val ws = rows.map(_._1.split(" ", -1).length.toLong).sum
      val subs = rows.map(r => bill(r._1)).sum
      l -> ((rows.size.toLong, ws, subs, subs.toDouble / ws))
    }
    assert(got === want)

    // the byte family bills more subwords per word on multi-byte text
    // at the same merge budget; the whitespace meter is 1.0 by def
    val byteF = TextOps.fertilityReportByteBpe(docs,
        ByteBpe.train(docs, 20)).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    Seq("fr", "ja").foreach { l =>
      assert(byteF(l) > got(l)._4,
        s"$l: byte fertility ${byteF(l)} must exceed char ${got(l)._4}")
    }
  }

  test("tokenizer-metered temperature pricing: quotas ≡ a driver replay " +
      "of the kernel bill + α=½ arithmetic, DIVERGE from whitespace " +
      "pricing, and the metered fill spends the same unit") {
    import org.apache.spark.sql.graftexpr.BpeEncodeExpr
    val docs = graft.core.Tables.documents(spark, sfDir)
    val B = 12000L
    val model = Bpe.train(docs, 30)

    // driver bill: the kernel's pure-JVM entry point, per word, per doc
    val table = BpeEncodeExpr.MergeTable(model.merges)
    def bill(text: String): Long =
      text.split(" ", -1).map(w => BpeEncodeExpr.encode(
        org.apache.spark.unsafe.types.UTF8String.fromString(w), table)
        .numElements().toLong).sum
    val all = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), bill(r.getString(2))))

    // driver pricing: per-lang masses, sqrt shares folded lang-ascending
    // (the engine's exact IEEE tree), floored quota
    val masses = all.groupBy(_._2).view
      .mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
    val roots = masses.map { case (l, c) => (l, math.sqrt(c.toDouble)) }
    var total = 0.0
    roots.foreach { case (_, s) => total += s }
    val wantQuota = roots.map { case (l, s) =>
      (l, math.floor(s * B.toDouble / total).toLong) }.toMap

    val got = TextOps.temperatureQuotasBpe(docs, B, model).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.map(x => (x._1, x._3)).toMap === wantQuota)
    assert(got.map(x => (x._1, x._2)).toMap ===
      masses.toMap.view.mapValues(identity).toMap,
      "per-lang masses must be the tokenizer bill, not whitespace")

    // the divergence that motivates the family: pricing in subwords
    // reallocates quota vs the whitespace pricing on this corpus
    val ws = TextOps.temperatureQuotas(docs, B).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    assert(wantQuota.exists { case (l, q) => ws(l) != q },
      "metered quotas must diverge from whitespace quotas somewhere")

    // the metered fill: respects quotas, bills in the metered unit,
    // ≡ a driver replay of the selection
    val fill = TextOps.temperatureSampleBpe(docs, B, model).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(fill.nonEmpty)
    fill.foreach { case (_, _, _, cum, quota) => assert(cum <= quota) }
    val expected = all.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      val quota = wantQuota(lang)
      var cum = 0L
      rows.sortBy(_._1).flatMap { case (id, _, n) =>
        cum += n
        if (cum <= quota) Some((id, lang, n, cum, quota)) else None
      }
    }
    assert(fill.sortBy(_._1) === expected.sortBy(_._1),
      "metered fill must equal the driver replay row for row")
  }

  test("streaming tokenizer-metered temperature fill: frozen model + " +
      "frozen quotas + carried tallies ≡ the metered batch fill") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text")
    val base = java.nio.file.Files
      .createTempDirectory("graft_tempfill_met").toString
    val statePath = base + "/state"; val quotaPath = base + "/quotas"
    val modelDir = base + "/model"
    val model = Bpe.train(docs, 30)
    TokenizerStore.writeBpe(model, modelDir, spark)
    TextOps.temperatureQuotasBpe(docs, 12000L, model)
      .select("lang", "quota").write.parquet(quotaPath)
    val frozen = spark.read.parquet(quotaPath)

    type Row5 = (Long, String, Long, Long, Long)
    def rows(df: org.apache.spark.sql.DataFrame): Set[Row5] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val all = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val half = all.length / 2
    val batches = Seq(all.take(half), all.drop(half))

    val sunk = scala.collection.mutable.ArrayBuffer[Set[Row5]]()
    val stream = MemoryStream[(Long, String, String)](181, spark, None)
    val q = graft.stream.Streaming.streamTemperatureFillBpe(
        stream.toDF().toDF("doc_id", "lang", "text"), statePath, quotaPath,
        modelDir, (df, _) => sunk += rows(df))
      .start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    assert(sunk.size === 2)
    val batch = rows(TextOps.temperatureFillMetered(docs, frozen,
      Bpe.encode(docs, model).groupBy("doc_id")
        .agg(sum("n_subs").cast("long").as("n_tokens"))))
    assert(sunk.reduce(_ ++ _) === batch,
      "per-batch metered selections must union to the metered batch fill")
    // and ≡ the one-shot metered sample on the same corpus/model/budget
    assert(batch === rows(TextOps.temperatureSampleBpe(docs, 12000L,
      model)))
  }

  test("tokenizer-metered epoch pricing: quotas ≡ a driver replay of " +
      "the kernel bill + epoch arithmetic, DIVERGE from whitespace " +
      "pricing, and the metered fill repeats in the same unit") {
    import org.apache.spark.sql.graftexpr.BpeEncodeExpr
    val docs = graft.core.Tables.documents(spark, sfDir)
    val F = TextOps.epochRepeatFactor; val CAP = TextOps.epochCap
    val model = Bpe.train(docs, 30)

    // driver bill: the kernel's pure-JVM entry point, per word, per doc
    val table = BpeEncodeExpr.MergeTable(model.merges)
    def bill(text: String): Long =
      text.split(" ", -1).map(w => BpeEncodeExpr.encode(
        org.apache.spark.unsafe.types.UTF8String.fromString(w), table)
        .numElements().toLong).sum
    val all = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), bill(r.getString(2))))

    // driver pricing: metered masses, B = F·Σc, sqrt shares folded
    // lang-ascending (the engine's exact IEEE tree), floored quota,
    // then the integer epoch split
    val masses = all.groupBy(_._2).view
      .mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
    val mass = masses.map(_._2).sum
    val roots = masses.map { case (l, c) => (l, math.sqrt(c.toDouble)) }
    var total = 0.0
    roots.foreach { case (_, s) => total += s }
    val want = masses.zip(roots).map { case ((l, c), (_, s)) =>
      val quota = math.floor(s * (mass * F).toDouble / total).toLong
      val fe = math.min(quota / c, CAP)
      val rem = if (fe >= CAP) 0L else quota % c
      l -> ((c, quota, fe, rem))
    }.toMap

    val got = TextOps.epochQuotasBpe(docs, F, CAP, model).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got === want,
      "metered epoch pricing must equal the driver replay")

    // the divergence that motivates the family: the whitespace pricing
    // computes DIFFERENT quotas (and hence repeats) on the same corpus
    val ws = TextOps.epochQuotas(docs, F, CAP).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(ws.exists { case (l, q) => want(l) != q },
      "metered epoch pricing must diverge from whitespace pricing")

    // the metered fill ≡ a driver replay: full passes for every doc of a
    // priced language, partial pass by metered-cumsum prefix on rem
    type R = (Long, String, Long, Long)
    val fill: Set[R] = TextOps.epochSampleBpe(docs, F, CAP, model)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val expected: Set[R] = all.groupBy(_._2).toSeq.flatMap {
      case (lang, rows) =>
        val (_, _, fe, rem) = want(lang)
        var cum = 0L
        rows.sortBy(_._1).flatMap { case (id, _, n) =>
          cum += n
          val ne = fe + (if (cum <= rem) 1L else 0L)
          (1L to ne).map(e => (id, lang, n, e))
        }
    }.toSet
    assert(fill === expected,
      "metered epoch fill must equal the driver replay row for row")

    // and it differs from the whitespace fill on this corpus — the
    // repeats genuinely move when the unit changes
    val wsFill: Set[R] = TextOps.epochSample(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(fill !== wsFill,
      "metered and whitespace epoch fills must differ on the testdata")
  }

  test("metered epoch shard fill + stream twin: frozen model + frozen " +
      "pricing + carried tallies ≡ the metered batch fill") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text")
    val F = TextOps.epochRepeatFactor; val CAP = TextOps.epochCap
    val base = java.nio.file.Files
      .createTempDirectory("graft_epochfill_met").toString
    val statePath = base + "/state"; val quotaPath = base + "/quotas"
    val streamState = base + "/stream_state"
    val modelDir = base + "/model"
    val model = Bpe.train(docs, 30)
    TokenizerStore.writeBpe(model, modelDir, spark)
    TextOps.epochQuotasBpe(docs, F, CAP, model).write.parquet(quotaPath)
    val frozen = spark.read.parquet(quotaPath)

    type R = (Long, String, Long, Long)
    def rows(df: org.apache.spark.sql.DataFrame): Set[R] =
      df.select("doc_id", "lang", "n_tokens", "epoch").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
    val all = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val half = all.length / 2
    val batches = Seq(all.take(half), all.drop(half))

    // shard form: union over shards ≡ the metered batch fill
    val sharded = batches.map { b =>
      rows(TextOps.epochFillShardMetered(
        b.toSeq.toDF("doc_id", "lang", "text"), statePath, frozen,
        TextOps.shardBillBpe(model)))
    }.reduce(_ ++ _)
    val perDoc = Bpe.encode(docs, model).groupBy("doc_id")
      .agg(sum("n_subs").cast("long").as("n_tokens"))
    val batch = rows(TextOps.epochFillMetered(docs, frozen, perDoc))
    assert(sharded === batch,
      "per-shard metered epoch fills must union to the batch fill")
    assert(batch === rows(TextOps.epochSampleBpe(docs, F, CAP, model)))

    // stream twin: same frozen pointers, fresh tally state
    val sunk = scala.collection.mutable.ArrayBuffer[Set[R]]()
    val stream = MemoryStream[(Long, String, String)](187, spark, None)
    val q = graft.stream.Streaming.streamEpochFillBpe(
        stream.toDF().toDF("doc_id", "lang", "text"), streamState,
        quotaPath, modelDir, (df, _) => sunk += rows(df))
      .start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    assert(sunk.size === 2)
    assert(sunk.reduce(_ ++ _) === batch,
      "per-batch metered epoch fills must union to the batch fill")
  }
}
