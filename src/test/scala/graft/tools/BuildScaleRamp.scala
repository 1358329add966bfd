package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builds the suffix-family scale-ramp corpora under /tmp: the sf0.1
  * documents table replicated ×2 and ×3 with offset doc_ids and a
  * per-copy token suffix (`regexp_replace` appends `zzN` to every
  * token of copy N > 0), so each copy keeps the SAME internal repeat
  * structure while sharing no tokens — and therefore no spurious
  * cross-copy repeats — with the others. That makes output size scale
  * with the factor (each copy mines its own repeats) while input
  * scale stresses the global suffix sort/LCP machinery, which is what
  * the SCALE.md §14 ramp measures. nation.parquet is copied for the
  * bench warmup scan. Writes only under /tmp; testdata stays
  * untouched.
  *
  * Round 12 (SCALE.md §17): lineitem + orders are replicated the same
  * way with offset keys (orderkey, custkey, suppkey), so each copy is
  * a DISJOINT subgraph of the q98 customer↔supplier interaction graph
  * — edges and nodes scale ×factor with zero cross-copy edges, which
  * is exactly the "more data, same topology class" ramp a PageRank
  * cost model (∝ edges per iteration) should be tested against.
  */
object BuildScaleRamp {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    for (factor <- Seq(2, 3)) {
      val out = s"/tmp/graft_sf0.$factor"
      val copies = (0 until factor).map { c =>
        if (c == 0) docs
        else docs
          .withColumn("doc_id", col("doc_id") + lit(c * 10000000L))
          .withColumn("text",
            regexp_replace(col("text"), "(\\S+)", s"$$1zz$c"))
      }
      copies.reduce(_ unionByName _)
        .repartition(16)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      // q98 graph tables: offset every key by a per-copy stride so the
      // copies share no orderkeys, customers, or suppliers.
      val li = spark.read.parquet(s"$src/lineitem.parquet")
      val ord = spark.read.parquet(s"$src/orders.parquet")
      def offsetKeys(df: org.apache.spark.sql.DataFrame, c: Int,
                     keys: Seq[String]): org.apache.spark.sql.DataFrame =
        keys.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(c * 100000000L)))
      (0 until factor).map { c =>
        if (c == 0) li else offsetKeys(li, c, Seq("l_orderkey", "l_suppkey"))
      }.reduce(_ unionByName _)
        .repartition(16)
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      (0 until factor).map { c =>
        if (c == 0) ord else offsetKeys(ord, c, Seq("o_orderkey", "o_custkey"))
      }.reduce(_ unionByName _)
        .repartition(16)
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
      spark.read.parquet(s"$src/nation.parquet")
        .write.mode("overwrite").parquet(s"$out/nation.parquet")
      // Round 13: events for the q121/q127 graph ramp — user ids AND
      // timestamps offset per copy (a ~20-year ns stride), so copies
      // share neither users nor minute buckets: the co-presence graph
      // gains ×factor disjoint subgraphs of identical topology class,
      // zero cross-copy edges. Written with ts as epoch-ns LONG (the
      // Tables.events normal form — the loader passes longs through).
      val ev = graft.Tables.events(spark, src)
      (0 until factor).map { c =>
        if (c == 0) ev
        else ev
          .withColumn("user_id", col("user_id") + lit(c * 100000000L))
          .withColumn("ts", col("ts") + lit(c * 630720000000000000L))
          .withColumn("event_id", col("event_id") + lit(c * 100000000L))
      }.reduce(_ unionByName _)
        .repartition(16)
        .write.mode("overwrite").parquet(s"$out/events.parquet")
      // embeddings for the q122/q126 k-means ramp: offset vec_ids,
      // vectors unchanged — ×factor rows through every Lloyd round
      // (the cost axis; the means are scale-invariant by design).
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      (0 until factor).map { c =>
        if (c == 0) emb
        else emb.withColumn("vec_id", col("vec_id") + lit(c * 100000000L))
      }.reduce(_ unionByName _)
        .repartition(16)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      println(s"built $out: ${spark.read.parquet(s"$out/documents.parquet").count()} docs, " +
        s"${spark.read.parquet(s"$out/lineitem.parquet").count()} lineitems, " +
        s"${spark.read.parquet(s"$out/events.parquet").count()} events, " +
        s"${spark.read.parquet(s"$out/embeddings.parquet").count()} vectors")
    }
    spark.stop()
  }
}
