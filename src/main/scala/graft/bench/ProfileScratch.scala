package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkEntry}
import graft.model.Tables
import graft.ext.{Dedup, Graph, Lm, Par, TextAnalysis}

/** TEMPORARY r21 profiling scratch — NOT part of the engine; deleted
  * before commit. Breaks hot cells into phases and times each. */
object ProfileScratch {
  def t(label: String)(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[prof] $label%-40s $s%7.3f s")
    s
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup like the bench
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.all.foreach { tb =>
      try Tables.load(spark, sfDir, tb).count() catch { case _: Throwable => () }
    }
    if (sys.env.get("PROF_EXCLUDE_INFER").contains("1"))
      spark.conf.set("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    val mode = args.headOption.getOrElse("cluster")
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep mode=$mode ===")
      mode match {
        case "cluster" => profileCluster(spark, sfDir)
        case "kn"      => profileKn(spark, sfDir)
        case "prof"    => profileProfiles(spark, sfDir)
        case "curate"  => profileCuration(spark, sfDir)
        case "cell"    => profileCell(spark, sfDir, args(1))
      }
      GraftSession.sweepCaches(spark)
      System.gc()
    }
    spark.stop()
  }

  def profileCluster(spark: SparkSession, dir: String): Unit = {
    val docs = Tables.documents(spark, dir)
    val par = spark.sparkContext.defaultParallelism
    t("docs.count") { docs.count() }
    t("fanOut only (noop)") { noop(Par.fanOut(docs, par)) }
    t("normalize (noop)") {
      noop(Par.fanOut(docs, par).select(TextAnalysis.normalize(col("text")).as("nt")))
    }
    t("tokens (noop)") {
      noop(Par.fanOut(docs, par).select(TextAnalysis.tokens(col("text")).as("tk")))
    }
    t("shingles (noop)") {
      noop(Par.fanOut(docs, par).select(
        TextAnalysis.shingles(col("text"), 3).as("sh")))
    }
    t("shingles+distinct (noop)") {
      noop(Par.fanOut(docs, par).select(
        array_distinct(TextAnalysis.shingles(col("text"), 3)).as("sh")))
    }
    t("shingles+distinct+explode (noop)") {
      noop(Par.fanOut(docs, par).select(col("doc_id").as("id"),
        col("source").as("blk"),
        array_distinct(TextAnalysis.shingles(col("text"), 3)).as("sh"))
        .select(col("id"), col("blk"), size(col("sh")).as("n"),
          explode(col("sh")).as("s")))
    }
    t("shingles from pre-split toks (noop)") {
      noop(Par.fanOut(docs, par)
        .withColumn("tk", TextAnalysis.tokens(col("text")))
        .select(col("doc_id"),
          array_distinct(TextAnalysis.shinglesFromTokens(col("tk"), 3)).as("sh")))
    }
    val exploded = Par.fanOut(docs, par).select(col("doc_id").as("id"),
      col("source").as("blk"),
      array_distinct(TextAnalysis.shingles(col("text"), 3)).as("sh"))
      .select(col("id"), col("blk"), size(col("sh")).as("n"),
        explode(col("sh")).as("s"))
    println("=== exploded plan ===")
    println(exploded.queryExecution.executedPlan.toString.take(8000))
    val pre = Par.fanOut(docs, par).select(col("doc_id").as("id"),
      col("source").as("blk"),
      array_distinct(TextAnalysis.shingles(col("text"), 3)).as("sh"))
    val ex = pre.select(col("id"), col("blk"), size(col("sh")).as("n"),
      explode(col("sh")).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("shingle+explode+persist (ex.count)") { ex.count() }
    val a = ex.as("a"); val b = ex.as("b")
    val inter = a.join(b,
        col("a.blk") === col("b.blk") && col("a.s") === col("b.s") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .agg(count(lit(1)).as("inter"))
    val pairs = inter.withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= 0.02)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    t("self-join+agg -> pairs (noop)") { noop(pairs) }
    var comp: DataFrame = null
    t("connectedComponents (cold pairs)") {
      comp = Graph.connectedComponents(pairs, "id_a", "id_b")
        .withColumnRenamed("id", "doc_id")
    }
    t("final join+agg (x_cluster_split tail)") {
      noop(docs.select(col("doc_id"))
        .join(comp, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
        .withColumn("split", graft.ext.Sampling.deterministicSplit(
          col("cluster_id"), Seq("train" -> 80, "valid" -> 90, "test" -> 100)))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"))
        .orderBy("split"))
    }
    ex.unpersist()
    t("whole cell x_cluster_split") {
      SparkEntry.queries("x_cluster_split")(spark, dir).count()
    }
  }

  def profileKn(spark: SparkSession, dir: String): Unit = {
    val docs = Tables.documents(spark, dir)
    var model: Lm.KnModel = null
    t("knBigramTrain (lazy build)") {
      model = Lm.knBigramTrain(docs.filter(col("doc_id") % 2 === 0), "text")
    }
    t("model.bigrams.count (train agg)") { model.bigrams.count() }
    t("model.totals (vocab pass)") { noop(model.totals) }
    t("knScore (noop)") {
      noop(Lm.knScore(docs, "doc_id", "text", model))
    }
    t("whole cell x_kn_perplexity") {
      SparkEntry.queries("x_kn_perplexity")(spark, dir).count()
    }
    t("whole cell x_model_curation_pipeline") {
      SparkEntry.queries("x_model_curation_pipeline")(spark, dir).count()
    }
  }

  def profileProfiles(spark: SparkSession, dir: String): Unit = {
    val ev = Tables.events(spark, dir)
    val prof = ev.filter(col("ts").isNotNull)
      .groupBy(col("user_id"), hour(col("ts")).as("h"))
      .agg(avg("value").as("m"))
      .groupBy("user_id")
      .agg(map_from_entries(collect_list(struct(col("h"), col("m"))))
        .as("mm"))
      .select(col("user_id"),
        transform(sequence(lit(0), lit(23)),
          h => coalesce(element_at(col("mm"), h), lit(0.0))).as("p"))
    t("userProfiles (noop)") { noop(prof) }
    t("whole cell x_profile_similarity") {
      SparkEntry.queries("x_profile_similarity")(spark, dir).count()
    }
  }

  def profileCuration(spark: SparkSession, dir: String): Unit = {
    val docs = Tables.documents(spark, dir)
    var model: Lm.KnModel = null
    t("knBigramTrain") {
      model = Lm.knBigramTrain(docs.filter(col("doc_id") % 2 === 0), "text")
    }
    val scored = Lm.knScore(docs, "doc_id", "text", model)
      .select(col("id").as("doc_id"),
        round(col("avg_nll") + lit(1e-9), 4).as("nll_r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("knScore -> scored persist (count)") { scored.count() }
    val med = scored.agg(round(expr("percentile(nll_r, 0.5d)") + lit(1e-9), 4).as("m"))
    val gated = docs.join(scored, "doc_id")
      .crossJoin(broadcast(med)).filter(col("nll_r") <= col("m"))
    t("gate (noop)") { noop(gated) }
    var surv: org.apache.spark.sql.DataFrame = null
    t("exactDedup -> surv persist (count)") {
      surv = Dedup.exactDedup(gated, "text", "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      surv.count()
    }
    var w: org.apache.spark.sql.DataFrame = null
    t("dsirWeightsWithin (noop)") {
      w = graft.ext.Sampling.dsirWeightsWithin(
        surv, col("lang") === "en", "text", 64)
      noop(w)
    }
    t("dsirScore + topk + join (noop)") {
      noop(graft.ext.Sampling.dsirScore(surv, "doc_id", "text", w, 64, seed = 41)
        .orderBy(round(col("key") + lit(1e-9), 6).desc, col("id").asc)
        .limit(50)
        .join(surv.select(col("doc_id"), col("nll_r")),
          col("id") === col("doc_id"))
        .select(col("doc_id"), col("nll_r"),
          round(col("logw") + lit(1e-9), 4).as("logw_r")))
    }
    scored.unpersist(); surv.unpersist(); model.release()
  }

  def profileCell(spark: SparkSession, dir: String, names: String): Unit =
    names.split(",").foreach { n =>
      t(s"cell $n") { SparkEntry.queries(n)(spark, dir).count() }
      GraftSession.sweepCaches(spark)
    }
}
