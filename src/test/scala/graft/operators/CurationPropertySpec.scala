package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property and edge-case coverage for the curation operators: bound and
  * monotonicity invariants over generated corpora, plus null/blank text
  * behavior (real corpora are full of both). */
class CurationPropertySpec extends SparkTestBase {

  private def cases[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val genWord: Gen[String] = Gen.oneOf(
    Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString),
    Gen.oneOf("the", "and", "of", "#", "...", "a1", "42"))

  private val genDoc: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    ws <- Gen.listOfN(n, genWord)
    sep <- Gen.oneOf(" ", " ", " ", "\n")
  } yield ws.mkString(sep)

  test("Kneser-Ney bigram model is properly normalized per context") {
    // For every observed context w1, Σ over the FULL vocabulary of
    // p(w2|w1) must equal exactly 1 — the discounted mass D·N1+(w1·)
    // redistributed via continuation weights sums back to what was
    // removed. Checked by scoring a synthetic doc set containing every
    // (context, vocab-word) pair once: each doc's nll is -ln p of its
    // single bigram, so Σ exp(-nll) per context = Σ p.
    val trainTxt = cases(genDoc, 12).filter(_.split("\\s+").count(_.nonEmpty) >= 2)
    val train = df("text STRING", trainTxt.map(Row(_)))
    // vocabulary of CONTINUATIONS (tokens at position >= 1 somewhere):
    // a word only ever seen doc-initial has zero continuation mass and
    // deliberately draws the 1/(V+1) OOV floor instead — including it
    // would add exactly floor mass on top of the normalized 1
    val vocab = trainTxt.flatMap(
      _.toLowerCase.split("\\s+").filter(_.nonEmpty).drop(1)).distinct
    val contexts = trainTxt.flatMap { t =>
      val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      ws.dropRight(1)
    }.distinct.take(8)
    val probes = for {
      (w1, i) <- contexts.zipWithIndex
      (w2, j) <- vocab.zipWithIndex
    } yield Row((i * 10000 + j).toLong, s"$w1 $w2")
    val out = LmScore.knBigramNll(train, "text",
        df("doc_id BIGINT, text STRING", probes), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
    val byCtx = out.groupBy(_._1 / 10000)
      .view.mapValues(_.map { case (_, nll) => math.exp(-nll) }.sum)
    byCtx.foreach { case (ctx, total) =>
      // rounding at 6 dp per doc bounds the drift well under 1e-3
      assert(math.abs(total - 1.0) < 1e-3,
        s"context ${contexts(ctx.toInt)}: sum p = $total")
    }
    assert(byCtx.nonEmpty)
  }

  test("quality metrics stay in bounds over arbitrary documents") {
    val texts = cases(genDoc, 120)
    val docs = df("doc_id BIGINT, text STRING",
      texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) })
    QualityFilter.metrics(docs, "doc_id", "text").collect().foreach { r =>
      assert(r.getInt(1) >= 0)                                   // n_words
      assert(r.getDouble(2) >= 0.0)                              // mean_word_len
      Seq(4, 5, 6).foreach(i =>                                  // line/word fracs
        assert(r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0, s"col $i: $r"))
      assert(r.getInt(7) >= 0 && r.getInt(7) <= r.getInt(1))     // stopwords ≤ words
      assert(r.getDouble(8) >= 0.0 && r.getDouble(8) < 1.0)      // dup_line_frac
    }
  }

  test("sampling is monotone in the fraction (kept sets nest)") {
    val docs = df("doc_id BIGINT, text STRING",
      (1 to 300).map(i => Row(i.toLong, s"doc body number $i")))
    val fracs = Seq(0.1, 0.3, 0.5, 0.9)
    val kept = fracs.map(f =>
      Sample.hashSample(docs, "text", f).collect().map(_.getLong(0)).toSet)
    kept.sliding(2).foreach { case Seq(lo, hi) =>
      assert(lo.subsetOf(hi), s"smaller fraction kept rows the larger dropped")
    }
    // split's train side IS the hash-sample kept set at the same fraction
    // (identical md5-threshold predicate)
    val tr = Split.hashSplit(docs, "text", 0.5).filter(col("split") === "train")
      .collect().map(_.getLong(0)).toSet
    assert(tr == kept(2))
  }

  test("PII redaction is idempotent and count-consistent") {
    val genPii: Gen[String] = for {
      base <- genDoc
      insert <- Gen.oneOf(" bob@x.io ", " 10.0.0.1 ", " 123-45-6789 ",
        " 555-123-4567 ", " ")
    } yield base + insert + base.take(10)
    val texts = cases(genPii, 100)
    val docs = df("doc_id BIGINT, text STRING",
      texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) })
    val once = Pii.redact(docs, "doc_id", "text")
    val twice = Pii.redact(once, "doc_id", "text")
    val a = once.orderBy("doc_id").collect().map(_.getString(1)).toSeq
    val b = twice.orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(a == b) // placeholders contain no matchable PII
    // after redaction, detect finds nothing
    assert(Pii.detect(once, "doc_id", "text")
      .filter(col("has_pii")).count() == 0L)
  }

  test("null and blank texts flow through without crashing") {
    val docs = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, null), Row(2L, ""), Row(3L, "   "), Row(4L, "real text here of the")))
    // metrics: null text → null struct fields; blanks → zero counts
    val m = QualityFilter.metrics(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(m(0).isNullAt(1))                   // null in, null out
    assert(m(1).getInt(1) == 0 && m(2).getInt(1) == 0)
    // survivor filter silently drops null/blank (keep is null/false)
    assert(QualityFilter.gopherFilter(docs, "doc_id", "text", minWords = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(4L))
    // redact: null stays null
    assert(Pii.redact(docs, "doc_id", "text").orderBy("doc_id").head().isNullAt(1))
    // hash sampling: md5(null) is null → row dropped, not crashed
    assert(Sample.hashSample(docs, "text", 1.0).count() == 3L)
    // dedup: null text groups with itself, min id survives
    val d = Dedup.exactDedup(docs, "doc_id", "text")
    assert(d.count() >= 3L)
  }

  test("line dedup invariants over generated multi-line corpora") {
    val texts = cases(genDoc, 100)
    val docs = df("doc_id BIGINT, text STRING",
      texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) })
    for (k <- Seq(1, 3, 10)) {
      val hot = Lines.duplicatedLines(docs, "doc_id", "text", k)
        .collect().map(_.getString(0)).toSet
      val out = Lines.dedupLines(docs, "doc_id", "text", k).collect()
      // row-preserving, and no surviving text contains a hot line
      assert(out.length == 100)
      out.filter(_.getString(1).nonEmpty).foreach { r =>
        // "" is the all-boilerplate representation, not a surviving line
        val lines = r.getString(1).split("\n", -1).toSet
        assert(lines.intersect(hot).isEmpty, s"hot line survived at k=$k")
      }
      // non-hot lines survive with multiplicity and order (spot: rebuild equals
      // filtering the original line sequence)
      val byId = docs.collect().map(r => r.getLong(0) ->
        Option(r.getString(1)).getOrElse("")).toMap
      out.foreach { r =>
        val expect = byId(r.getLong(0)).split("\n", -1)
          .filterNot(hot.contains).mkString("\n")
        assert(r.getString(1) == expect)
      }
    }
  }

  test("token-budget sampling: per-key spend bounded by budget + one doc") {
    val rows = cases(Gen.chooseNum(1L, 50L), 200).zipWithIndex.map {
      case (tok, i) => Row(i.toLong, s"src${i % 5}", tok)
    }
    val docs = df("doc_id BIGINT, source STRING, n_tokens BIGINT", rows)
    val budgets = Map("src0" -> 100L, "src1" -> 0L, "src2" -> 37L, "src3" -> 10000L)
    val kept = Sample.tokenBudgetPerKey(docs, "source", "n_tokens", "doc_id", budgets)
      .collect().groupBy(_.getString(1))
    budgets.foreach { case (k, b) =>
      val spend = kept.getOrElse(k, Array()).map(_.getLong(2)).sum
      val maxDoc = 50L
      assert(spend <= b + maxDoc, s"$k spent $spend over budget $b")
      // greedy: if anything was excluded, the budget is actually exhausted
      val total = docs.collect().filter(_.getString(1) == k).map(_.getLong(2)).sum
      if (spend < total) assert(spend >= b, s"$k stopped early: $spend < $b")
    }
    assert(!kept.contains("src4")) // budgetless key drops
  }

  test("lengthBuckets invariants: full batches, bounded padding, total coverage") {
    val lens = cases(Gen.chooseNum(1L, 3000L), 300)
    val docs = df("id BIGINT, len BIGINT",
      lens.zipWithIndex.map { case (l, i) => Row(i.toLong, l) })
    val edges = Seq(128L, 512L, 2048L)
    val out = Pack.lengthBuckets(docs, "id", "len", edges, batchSize = 8,
        shards = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("len"),
        r.getAs[Long]("bucket_cap"), r.getAs[Long]("shard"),
        r.getAs[Long]("batch"), r.getAs[Long]("padding")))
    assert(out.length == 300) // nothing dropped
    out.foreach { case (_, len, cap, _, _, padding) =>
      assert(edges.contains(cap))
      assert(cap >= math.min(len, edges.last)) // smallest admissible cap
      assert(padding == math.max(cap - len, 0L) && padding < cap)
    }
    // every batch except possibly the last per (cap, shard) is FULL
    out.groupBy(t => (t._3, t._4)).foreach { case (_, rows) =>
      val byBatch = rows.groupBy(_._5).toSeq.sortBy(_._1)
      byBatch.dropRight(1).foreach { case (_, b) => assert(b.length == 8) }
    }
  }

  test("winsorize properties: output within bounds, order-preserving, idempotent") {
    val vals = cases(Gen.chooseNum(-1000.0, 1000.0), 200)
    val docs = df("id BIGINT, k STRING, v DOUBLE",
      vals.zipWithIndex.map { case (v, i) =>
        Row(i.toLong, s"g${i % 3}", math.rint(v * 100) / 100) })
    val out = Profile.winsorize(docs, "k", "v", 0.1, 0.9)
      .select("id", "k", "v", "value_clipped", "was_clipped").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4)))
    val byKey = out.groupBy(_._2)
    byKey.values.foreach { rows =>
      val clipped = rows.map(_._4)
      // clipped values live inside the clipped range (bounds are data values)
      assert(clipped.min >= rows.filter(!_._5).map(_._4).min)
      // order preservation: v1 <= v2 ⟹ clip(v1) <= clip(v2)
      val sorted = rows.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 <= b._4)
        case _           =>
      }
    }
    // idempotence: winsorizing the clipped column again changes nothing
    val once = Profile.winsorize(docs, "k", "v", 0.1, 0.9)
      .select(col("id"), col("k"), col("value_clipped").as("v"))
    val twice = Profile.winsorize(once, "k", "v", 0.1, 0.9)
      .select("id", "value_clipped").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val first = out.map(t => t._1 -> t._4).toMap
    assert(twice == first)
  }

  test("ChatML render ∘ parse is the identity over generated conversations") {
    // content: any printable text WITHOUT the reserved markers (the
    // operator's documented contract); newlines and empties included
    val genContent: Gen[String] = for {
      n <- Gen.chooseNum(0, 8)
      ws <- Gen.listOfN(n, genWord)
      sep <- Gen.oneOf(" ", "\n", "  ")
    } yield ws.mkString(sep)
    val genConv: Gen[Seq[(String, String)]] = for {
      n <- Gen.chooseNum(1, 6)
      turns <- Gen.listOfN(n, for {
        role <- Gen.oneOf("user", "assistant", "system", "tool")
        content <- genContent
      } yield (role, content))
    } yield turns

    val convs = cases(genConv, 60).zipWithIndex
    val rows = convs.flatMap { case (turns, cid) =>
      turns.zipWithIndex.map { case ((role, content), t) =>
        Row(cid.toLong, t.toLong, role, content)
      }
    }
    val turnsDf = df("conv BIGINT, turn BIGINT, role STRING, content STRING", rows)
    val back = Sft.parseChatML(
        Sft.renderChatML(turnsDf, "conv", "turn", "role", "content"),
        "conv_id", "rendered")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getString(3))))
      .toMap
    val expected = convs.flatMap { case (turns, cid) =>
      turns.zipWithIndex.map { case ((role, content), t) =>
        (cid.toLong, t.toLong) -> ((role, content))
      }
    }.toMap
    assert(back == expected)
  }
}
