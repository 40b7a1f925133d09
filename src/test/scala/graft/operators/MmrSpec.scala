package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The MMR trajectory must equal an independent plain-Scala greedy
  * replay (same pool, same pinned score chain, same tie-breaks), and
  * diversification must actually happen: with a pool dominated by one
  * tight cluster, MMR's second pick leaves the cluster where pure
  * relevance ranking would not.
  */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // query 100 points along (1,0,0); ids 1-3 a tight off-axis cluster
  // (intra-sim ≈ 1 while rel ≈ 0.90, so the λ=0.5 penalty beats the
  // cluster's relevance edge); id 4 relevant from a different
  // direction; id 5 near-orthogonal
  private val corpus: Seq[(Long, Seq[Float])] = Seq(
    1L -> Seq(0.9f, 0.43f, 0.0f),
    2L -> Seq(0.9f, 0.44f, 0.0f),
    3L -> Seq(0.9f, 0.42f, 0.01f),
    4L -> Seq(0.8f, -0.6f, 0.0f),
    5L -> Seq(0.0f, 0.1f, 1.0f),
    100L -> Seq(1.0f, 0.0f, 0.0f))
  private val K = 3
  private val Pool = 5
  private val Lam = 0.5

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x * x))
    val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x * x))
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  /** Independent replay. */
  private def reference(): Seq[(Long, Int, Double)] = {
    val byId = corpus.toMap.map { case (k, v) => k -> v.map(_.toDouble) }
    val q = byId(100L)
    val rel = byId.view.filterKeys(_ != 100L)
      .map { case (id, v) => id -> cos(v, q) }.toMap
    val pool = rel.toSeq.sortBy { case (id, r) => (-r, id) }.take(Pool)
      .map(_._1)
    var selected = List.empty[(Long, Int, Double)]
    for (step <- 1 to K) {
      val chosen = selected.map(_._1).toSet
      val best = pool.filter(!chosen(_)).map { id =>
        val maxsim =
          if (selected.isEmpty) 0.0
          else selected.map(s => cos(byId(id), byId(s._1))).max
        id -> (Lam * rel(id) - (1.0 - Lam) * maxsim)
      }.minBy { case (id, sc) => (-sc, id) }
      selected = selected :+ ((best._1, step,
        BigDecimal(best._2).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    selected
  }

  private def run(): Seq[(Long, Int, Double)] = {
    val df = corpus.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" === 100L)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    Mmr.mmrTopK(df, queries, "vec_id", "embedding", "query_id", "qvec",
        k = K, poolSize = Pool, lambda = Lam)
      .collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(_._2).toSeq
  }

  test("trajectory equals the independent greedy replay") {
    assert(run() == reference())
  }

  test("MMR diversifies: second pick leaves the top cluster") {
    val picks = run().map(_._1)
    // relevance order alone would pick the 1/2/3 cluster first;
    // with the penalty the second or third pick must be 4 or 5
    assert(Set(1L, 2L, 3L).contains(picks.head))
    assert(picks.tail.exists(id => id == 4L || id == 5L))
  }
}
