package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.Dedup
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    time("warmup")(docs.count())
    val toksOnly = docs.select(col("doc_id"), tokens(lower(col("text"))).as("t"))
    time("tokens only")(toksOnly.select(sum(size(col("t")))).first().getLong(0))
    val sh = docs.select(col("doc_id"), tokens(lower(col("text"))).as("_toks"))
      .withColumn("shingles", wordShinglesFromTokens(col("_toks"), 3))
      .drop("_toks")
    time("shingles")(sh.select(sum(size(col("shingles")))).first().getLong(0))
    val prep = sh.withColumn("sig", Dedup.minHashSignature(col("shingles"), 64))
    time("shingles+sig")(prep.select(sum(size(col("sig")))).first().getLong(0))
    val prepC = prep.cache()
    time("prep cached")(prepC.count())
    val rows = 8
    val banded = prepC.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(7)),
        b => struct(b.as("band_idx"),
          xxhash64(slice(col("sig"), b * rows + lit(1), lit(rows))).as("band_hash")))).as("band"))
      .select(col("doc_id"), col("band.band_idx").as("band_idx"), col("band.band_hash").as("band_hash"))
    time("banded")(banded.count())
    val cand = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("id_a"))
      .join(banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("id_b")), Seq("band_idx","band_hash"))
      .filter(col("id_a") < col("id_b")).select("id_a","id_b").distinct()
    time("candidates")(cand.count())
    val lookup = prepC.select(col("doc_id"), col("shingles"))
    val verified = cand
      .join(lookup.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(lookup.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .withColumn("j", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("j") >= 0.8)
    time("verified")(verified.count())
    prepC.unpersist()
    time("full uncached")(Dedup.minHashNearDupPairs(docs, "doc_id", "text", 3, 64, 8, 0.8).count())
    spark.stop()
  }
}
