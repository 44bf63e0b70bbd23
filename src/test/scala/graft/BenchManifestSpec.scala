package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Keeps `tools/expected_queries.txt` — the board-coverage manifest the
 * Bench main checks its emitted board against — in lockstep with the
 * source tree. The manifest lives ON DISK (not in this JVM) precisely
 * so a bench run from a stale compiled tree diverges from the fresh
 * checkout's manifest and fails loudly; this spec is the other half of
 * that contract: adding or renaming a SparkEntry query without
 * regenerating the manifest fails here, with the exact lines to add.
 */
class BenchManifestSpec extends AnyFunSuite {

  test("expected_queries.txt matches SparkEntry.queries exactly") {
    val f = new java.io.File("tools/expected_queries.txt")
    assert(f.isFile, s"missing manifest ${f.getAbsolutePath}")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    val manifest =
      try src.getLines().map(_.trim).filter(_.nonEmpty).toVector
      finally src.close()
    assert(manifest == manifest.sorted, "manifest must be sorted")
    val tree = SparkEntry.queries.keySet
    val missing = tree -- manifest.toSet
    val stale = manifest.toSet -- tree
    assert(missing.isEmpty && stale.isEmpty,
      s"regenerate tools/expected_queries.txt — " +
        s"add: ${missing.toSeq.sorted.mkString(",")} " +
        s"remove: ${stale.toSeq.sorted.mkString(",")}")
  }
}
