package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/**
 * Structural guard for the UNPARTITIONED-window bug class — the
 * static-source companion to [[PlanGrowthSpec]]: every
 * `Window.orderBy` / zero-arg `Window.partitionBy()` in operator
 * source must carry a `bounded-window: <tag>` marker naming the
 * documented reason the frame cannot grow with the corpus (quantized
 * cells, a calendar grid, |rules|, a top-k…). The r8 `mannWhitney`
 * defect — an unpartitioned rank window over FULL-PRECISION value
 * cells, a single-reducer global sort at 100 TB on a continuous
 * metric — is the canary class this spec exists to catch at review
 * time instead of at scale.
 */
class WindowAuditSpec extends AnyFunSuite {

  private val srcRoot = new java.io.File("src/main/scala/graft")

  test("every unpartitioned window in src/main carries a documented " +
      "bounded-domain tag") {
    val sites = WindowAudit.scanTree(srcRoot)
    assert(sites.nonEmpty,
      "scanner found zero unpartitioned windows — the regex is broken " +
        "(the engine has dozens of legitimate annotated sites)")
    val untagged = sites.filter(_.tag.isEmpty)
    assert(untagged.isEmpty,
      s"unannotated unpartitioned window(s):\n  " +
        untagged.map(s => s"${s.file}:${s.line}").mkString("\n  ") +
        "\nEvery Window.orderBy / zero-arg Window.partitionBy moves its " +
        "whole input to ONE reducer. Either partition the window, bound " +
        "its input (quantized cells / calendar grid / top-k), or — if the " +
        "frame is already bounded — add a `// bounded-window: <tag>` " +
        "marker within " + WindowAudit.markerReach + " lines above it, " +
        "with the tag from WindowAudit.allowedTags and the bound cited.")
    val badTags = sites.filter(s =>
      s.tag.exists(t => !WindowAudit.allowedTags.contains(t)))
    assert(badTags.isEmpty,
      s"unknown bounded-window tag(s):\n  " +
        badTags.map(s => s"${s.file}:${s.line} -> ${s.tag.get}")
          .mkString("\n  ") +
        s"\nAllowed: ${WindowAudit.allowedTags.toSeq.sorted.mkString(", ")}")
  }

  test("canary: a planted unpartitioned window without a marker is caught") {
    val planted =
      """object Bad {
        |  import org.apache.spark.sql.expressions.Window
        |  import org.apache.spark.sql.functions._
        |  // an innocent comment that is NOT a marker
        |  val w = Window.orderBy(col("metric"))
        |  val wAll = Window.partitionBy()
        |}""".stripMargin
    val sites = WindowAudit.scan("Bad.scala", planted)
    assert(sites.size == 2, s"expected both planted sites, got $sites")
    assert(sites.forall(_.tag.isEmpty),
      s"planted windows must be flagged as unannotated, got $sites")
  }

  test("canary: the multi-line form and a tagged site scan correctly") {
    val src =
      """object Ok {
        |  // bounded-window: calendar-grid — one row per day
        |  val w = org.apache.spark.sql.expressions.Window
        |    .orderBy(col("day"))
        |  val fine = Window.partitionBy(col("k")).orderBy(col("v"))
        |  val myWindow = 1; val x = myWindow.toString
        |}""".stripMargin
    val sites = WindowAudit.scan("Ok.scala", src)
    // the partitioned window and the myWindow identifier must NOT match;
    // the multi-line unpartitioned one must, and must see its tag
    assert(sites.map(s => (s.line, s.tag)) == Seq((3, Some("calendar-grid"))),
      s"got $sites")
  }

  test("canary: a '\"' char literal before an unannotated window does " +
      "not blank it (tokenizer fail-open regression)") {
    // the r9 ADVICE failure mode: stripComments tracked only
    // double-quoted strings, so `case '"' =>` flipped the mode tracker
    // and every site after it was silently skipped
    val src =
      """object Quote {
        |  def f(c: Char) = c match { case '"' => 1; case '\'' => 2; case _ => 0 }
        |  val w = Window.orderBy(col("x"))
        |}""".stripMargin
    val sites = WindowAudit.scan("Quote.scala", src)
    assert(sites.map(s => (s.line, s.tag)) == Seq((3, None)), s"got $sites")
  }

  test("canary: odd quote count inside a triple-quoted SQL string does " +
      "not blank a following unannotated window") {
    val q = "\"\"\""
    val src =
      s"""object Sql {
         |  val sql = $q SELECT "a from t $q
         |  val w = Window.orderBy(col("x"))
         |}""".stripMargin
    val sites = WindowAudit.scan("Sql.scala", src)
    assert(sites.map(s => (s.line, s.tag)) == Seq((3, None)), s"got $sites")
  }

  test("canary: prose in comments does not count as a site, and an " +
      "unknown tag is distinguishable") {
    val src =
      """object Doc {
        |  /** scaladoc mentioning Window.orderBy(...) is not a site */
        |  // a line comment with Window.partitionBy() is not one either
        |  // bounded-window: not-a-real-tag
        |  val w = Window.orderBy(col("x"))
        |}""".stripMargin
    val sites = WindowAudit.scan("Doc.scala", src)
    assert(sites.map(s => (s.line, s.tag)) ==
      Seq((5, Some("not-a-real-tag"))), s"got $sites")
    assert(sites.forall(s =>
      !WindowAudit.allowedTags.contains(s.tag.get)))
  }
}
