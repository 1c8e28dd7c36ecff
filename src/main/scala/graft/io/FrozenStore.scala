package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Frozen-artifact store for trained models and their derived
  * config: train ONCE per (corpus, parameters), persist the result
  * as an at-rest parquet artifact with the same stage+atomic-swap
  * discipline the BM25/ANN layouts use, and have every serving face
  * READ the artifact instead of re-running training.
  *
  * Why this exists: the catalog deliberately ships several serving
  * faces over each trained model (batch scorer, curriculum bands,
  * ensemble gate, streaming twin…). Before this store each face
  * re-ran `trainHashedLogistic`/`bucketWeights`/`backoffTables` on
  * identical inputs — ~20 s of redundant training per bench pass at
  * sf0.1, and not the shape a real pipeline has: production serving
  * reads a frozen model artifact published by one training job. All
  * trainers involved are exact-integer/deterministic, so the cached
  * artifact is bit-identical to a retrain and every oracle hash is
  * unchanged.
  *
  * Scope: artifacts live under a per-JVM temp root (no cross-process
  * reuse — the testdata under a dir can change between driver runs,
  * so a persistent cache would need content fingerprints; within one
  * Verify/Bench JVM the corpus is immutable). Keys must encode the
  * sf dir and every training parameter.
  */
object FrozenStore {

  private lazy val root = java.nio.file.Files
    .createTempDirectory("graft_frozen")

  private val dfPaths =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val memos =
    scala.collection.concurrent.TrieMap.empty[String, Any]

  private def safeName(key: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(key.getBytes("UTF-8"))
    d.take(12).map("%02x".format(_)).mkString
  }

  /** A DataFrame-shaped artifact (weight tables, LM ratio tables):
    * first call builds and publishes (write to `<name>.stage`, then
    * one atomic rename — a crashed build leaves only a stage dir
    * that the next call overwrites); every call returns a reader
    * over the published parquet, so consumers exercise the true
    * read-the-artifact path.
    */
  def frozenDf(spark: SparkSession, key: String)
      (build: => DataFrame): DataFrame = {
    val path = dfPaths.getOrElseUpdate(key, this.synchronized {
      val fin = root.resolve(safeName(key))
      if (!java.nio.file.Files.exists(fin)) {
        val stage = root.resolve(safeName(key) + ".stage")
        build.write.mode("overwrite").parquet(stage.toString)
        java.nio.file.Files.move(stage, fin,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      fin.toString
    })
    spark.read.parquet(path)
  }

  /** A driver-sized derived value (a sketch cut, a threshold pair, a
    * collected weight array): memoized per key. At production scale
    * these are 1-row artifacts published NEXT TO the model they were
    * derived from (same stage+swap); here they stay in-process
    * because their recompute cost is what we are deduplicating, not
    * their storage.
    */
  def memo[T](key: String)(build: => T): T =
    memos.getOrElseUpdate(key, this.synchronized {
      memos.getOrElse(key, build)
    }).asInstanceOf[T]

  /** A DIRECTORY-shaped artifact (an ANN layout: partitioned corpus +
    * reps codebook under one root): `build` populates the staged
    * root, which then atomically renames into place; returns the
    * published path. Serving faces probe the at-rest layout exactly
    * as a 100 TB deployment would — trained once, queried forever —
    * instead of re-training a throwaway temp copy per call.
    */
  def frozenPath(key: String)(build: String => Unit): String =
    dfPaths.getOrElseUpdate("path|" + key, this.synchronized {
      val fin = root.resolve(safeName("path|" + key))
      if (!java.nio.file.Files.exists(fin)) {
        val stage = root.resolve(safeName("path|" + key) + ".stage")
        build(stage.toString)
        java.nio.file.Files.move(stage, fin,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      fin.toString
    })

  /** Recursive local-FS copy — frozen-template instantiation: frozen
    * artifacts reference files by relative path and are immutable, so
    * a copied tree IS the artifact, byte-for-byte. The walk stream is
    * closed (directory handles — callers copy repeatedly per bench
    * rep) and REPLACE_EXISTING lets a retry over a partially
    * populated destination converge.
    */
  def copyTree(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    scala.util.Using.resource(java.nio.file.Files.walk(s)) { walk =>
      walk.forEach { p =>
        val t = d.resolve(s.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }
}
