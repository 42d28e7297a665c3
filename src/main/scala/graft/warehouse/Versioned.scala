package graft.warehouse

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic versioned publish — the lakehouse publish-then-flip pattern:
  * every publish writes a new IMMUTABLE generation directory
  * (`gen=<v>/`) and then atomically flips a single `_current` pointer
  * file at it. Readers resolve the pointer and scan exactly one
  * generation, so they never observe a half-written table; rollback is
  * rewriting the pointer to an older generation (the data never moves);
  * time travel is reading a named generation.
  *
  * All pointer operations go through the Hadoop FileSystem API (atomic
  * single-file rename on HDFS; on object stores without atomic rename,
  * front this with a rename-capable metadata volume — same caveat as
  * the streaming state protocol). The flip protocol is staged:
  * write `_current.tmp`, delete `_current`, rename tmp into place.
  * A crash between the delete and the rename leaves only the tmp file;
  * [[resolve]] completes the interrupted flip before reading, so the
  * window is self-healing — the same restore-before-read discipline as
  * the streaming index swap.
  *
  * At 100 TB: a publish is one parquet write of the new generation
  * (any layout — partitioned, bucketed, z-ordered) plus one ~8-byte
  * pointer flip; concurrent readers keep scanning the previous
  * generation until the flip lands. Old generations are retained for
  * rollback/time-travel until [[vacuum]] removes all but the last
  * `keep`.
  */
object Versioned {

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private def pointer(root: String) = new Path(s"$root/_current")
  private def pointerTmp(root: String) = new Path(s"$root/_current.tmp")
  private def genDir(root: String, v: Long) = new Path(s"$root/gen=$v")

  private def writeFile(f: FileSystem, p: Path, body: String): Unit = {
    val out = f.create(p, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  private def readFile(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** Complete an interrupted pointer flip (tmp exists, pointer missing),
    * then return the current version, or None for an empty table.
    *
    * Concurrency: the heal rename RACES both the writer's own flip and
    * other readers' heals — whoever renames first wins and everyone
    * else's rename returns false. A failed rename is therefore only an
    * error if the pointer is STILL missing afterwards; "pointer present"
    * means some actor completed the flip, which is the outcome the heal
    * wanted. */
  def resolve(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    if (!f.exists(pointer(root)) && f.exists(pointerTmp(root)) &&
        !f.rename(pointerTmp(root), pointer(root)) &&
        !f.exists(pointer(root)))
      throw new java.io.IOException(
        s"versioned table $root: could not complete interrupted pointer flip")
    if (f.exists(pointer(root))) Some(readFile(f, pointer(root)).toLong)
    else None
  }

  /** All published generations, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    if (!f.exists(new Path(root))) Seq.empty
    else f.listStatus(new Path(root)).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("gen="))
      .map(_.stripPrefix("gen=").toLong).sorted
  }

  /** Publish `df` as the next generation and atomically flip the
    * pointer at it. Returns the new version number. A publish that
    * crashes before the flip leaves an orphan generation directory the
    * pointer never references — invisible to readers, removed by the
    * next [[vacuum]]. */
  def publish(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val v = versions(spark, root).lastOption.getOrElse(0L) + 1L
    df.write.mode("overwrite").parquet(genDir(root, v).toString)
    setPointer(spark, root, v)
    v
  }

  /** Atomically point the table at an already-written generation `v` —
    * the commit point of a stage-then-flip publish that wrote its own
    * generation directory (plus any [[setGenerationMeta]]) first. */
  def setCurrent(spark: SparkSession, root: String, v: Long): Unit =
    rollback(spark, root, v)

  /** Point the table at generation `v` (rollback or roll-forward). */
  def rollback(spark: SparkSession, root: String, v: Long): Unit = {
    require(versions(spark, root).contains(v),
      s"versioned table $root has no generation $v")
    setPointer(spark, root, v)
  }

  /** `onBeforeFlip` is a test seam invoked between retiring the old
    * pointer and the tmp→pointer rename — the window where a concurrent
    * reader's [[resolve]] heal can legitimately complete OUR flip. */
  private[graft] def setPointer(spark: SparkSession, root: String, v: Long,
                                onBeforeFlip: () => Unit = () => ()): Unit = {
    val f = fs(spark, root)
    resolve(spark, root) // finish any interrupted flip first
    writeFile(f, pointerTmp(root), v.toString)
    if (f.exists(pointer(root)) && !f.delete(pointer(root), false))
      throw new java.io.IOException(
        s"versioned table $root: could not retire old pointer")
    onBeforeFlip()
    if (!f.rename(pointerTmp(root), pointer(root))) {
      // a concurrent reader healing the delete→rename window may have
      // renamed our tmp into place already: the rename reports false but
      // the flip SUCCEEDED. Only a pointer that is still absent — or one
      // carrying a different version — is a real failure.
      val healed = f.exists(pointer(root)) &&
        scala.util.Try(readFile(f, pointer(root)).toLong).toOption.contains(v)
      if (!healed)
        throw new java.io.IOException(
          s"versioned table $root: could not flip pointer to gen=$v")
    }
  }

  /** The current generation's rows (self-healing resolve first). */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, resolve(spark, root).getOrElse(
      throw new IllegalStateException(s"versioned table $root is empty")))

  /** Time travel: a specific published generation. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame =
    spark.read.parquet(genDir(root, v).toString)

  /** Attach a small metadata string to a generation (e.g. the streaming
    * batch id it materializes) — written INSIDE the generation directory,
    * so for write-then-flip protocols it lands before the pointer flip
    * and travels with the generation under rollback/vacuum. */
  def setGenerationMeta(spark: SparkSession, root: String, v: Long,
                        body: String): Unit =
    writeFile(fs(spark, root), new Path(genDir(root, v), "_meta"), body)

  /** The metadata attached by [[setGenerationMeta]], if any. */
  def generationMeta(spark: SparkSession, root: String,
                     v: Long): Option[String] = {
    val f = fs(spark, root)
    val p = new Path(genDir(root, v), "_meta")
    if (f.exists(p)) Some(readFile(f, p)) else None
  }

  /** Drop all generations except the newest `keep` (never the current
    * pointer's target) plus any orphan tmp pointer. Maintenance op:
    * run QUIESCED (no publish in flight), like index compaction — the
    * tmp reap would otherwise race a mid-protocol flip. */
  def vacuum(spark: SparkSession, root: String, keep: Int): Unit = {
    val f = fs(spark, root)
    val cur = resolve(spark, root) // completes an interrupted flip first
    // a setPointer that crashed between writing the tmp and deleting the
    // live pointer leaves a STALE tmp next to an intact pointer; resolve
    // only consumes tmp when the pointer is missing, so reap it here
    if (f.exists(pointer(root)) && f.exists(pointerTmp(root)))
      f.delete(pointerTmp(root), false)
    val vs = versions(spark, root)
    val retain = (vs.takeRight(keep) ++ cur).toSet
    vs.filterNot(retain.contains)
      .foreach(v => { f.delete(genDir(root, v), true); () })
  }
}
