package graft.tools

import graft.conll.Triple

/** Triple precision/recall scoring against a golden set — the project's
  * P/R oracle (BASELINE.json: P/R ≥ 0.95 vs reference-emitted triples,
  * in the reference's own sorted-triples diff spirit,
  * CoNLLRDFUpdater.java:453-477).
  */
object PrScore {

  final case class Score(precision: Double, recall: Double, tp: Long, fp: Long, fn: Long) {
    def f1: Double =
      if (precision + recall == 0) 0.0 else 2 * precision * recall / (precision + recall)
  }

  def score(got: Set[Triple], expected: Set[Triple]): Score = {
    val tp = (got intersect expected).size.toLong
    val fp = (got diff expected).size.toLong
    val fn = (expected diff got).size.toLong
    Score(
      if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp),
      if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn),
      tp, fp, fn)
  }
}
