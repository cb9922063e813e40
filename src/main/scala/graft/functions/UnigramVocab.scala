package graft.functions

/** Driver-held unigram-LM vocabulary (piece → integer-e6 log-probability
  * score) attached to [[UnigramViterbi]] as a codegen REFERENCE OBJECT —
  * the same O(vocab) driver-artifact shape as the k-means codebook in
  * [[NearestCentroid]]. Serialized with the plan as two flat arrays; the
  * lookup HashMap is `@transient lazy`, rebuilt once per executor JVM on
  * first use (multi-JVM safe — ClusterSmokeSpec's pattern).
  */
final class UnigramVocab(
    val pieces: Array[String],
    val scores: Array[Long],
    val maxLen: Int) extends Serializable {
  require(pieces.length == scores.length,
    s"UnigramVocab: ${pieces.length} pieces vs ${scores.length} scores")

  @transient private lazy val map: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), java.lang.Long.valueOf(scores(i))); i += 1 }
    m
  }

  /** Score of `piece`, or `Long.MinValue` when absent (the DP's "no such
    * piece" sentinel — real scores are small negative e6 logs). */
  def score(piece: String): Long = {
    val v = map.get(piece)
    if (v eq null) Long.MinValue else v.longValue()
  }

  def size: Int = pieces.length
}
