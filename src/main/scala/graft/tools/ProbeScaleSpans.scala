package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.RepeatedSpans

/** Scale probe for the r8 repeated-span operator — measures, instead
  * of arguing, the no-self-join claim: a UNIVERSAL 10-token
  * boilerplate passage planted in EVERY document is the worst-case
  * element (df = n, the stop-word-grade exposure that made the
  * pre-prefix-filter containment quadratic), yet span detection cost
  * must stay linear in corpus size because the frequent-gram path is
  * a flag-join, never a pair-join.
  *
  * Corpus: nDocs × 100 tokens; tokens unique per (doc, pos) except
  * positions [20, 30), which carry the shared passage. Expected
  * output: EXACTLY one span [20, 30) per document — recovery is
  * asserted, not sampled. Doubling nDocs must ~double wall time.
  * Iteration aid; not part of the declared surface.
  */
object ProbeScaleSpans {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-scale-spans")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe-scale-spans] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val tokensPer = 100
    for (nDocs <- Seq(50000L, 100000L)) {
      val corpus = spark.range(nDocs).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(tokensPer - 1)), i =>
          when(i.between(20, 29), concat(lit("boiler"), i))
            .otherwise(concat(lit("u"),
              xxhash64(col("id") * tokensPer + i, lit(13)))))).as("text"))
        .localCheckpoint() // corpus generation priced outside the probe

      val spans = t(s"repeated spans ($nDocs docs × $tokensPer tokens, " +
          "universal 10-token passage)") {
        val out = RepeatedSpans.repeatedSpans(
          corpus, "doc_id", "text", k = 8, minDocs = 2)
        val agg = out.agg(
          count(lit(1)), countDistinct(col("doc_id")),
          min(col("span_start")), max(col("span_start")),
          min(col("span_end")), max(col("span_end"))).collect()(0)
        agg
      }
      val (n, docs) = (spans.getLong(0), spans.getLong(1))
      assert(n == nDocs && docs == nDocs,
        s"expected exactly one span per doc: n=$n docs=$docs")
      assert(spans.getInt(2) == 20 && spans.getInt(3) == 20 &&
        spans.getInt(4) == 30 && spans.getInt(5) == 30,
        s"every span must be [20,30): $spans")
      println(s"[probe-scale-spans] $nDocs docs: exactly $n spans [20,30) — PASS")
    }
    spark.stop()
  }
}
