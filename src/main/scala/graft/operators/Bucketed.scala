package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-located join — the shuffle-elimination tool for the
  * repeated big-to-big joins of a 100 TB pipeline (SURVEY §4: pre-bucket
  * both fact tables on the join key once at ingest; every later join on
  * that key reads bucket metadata instead of exchanging rows).
  *
  * Both sides are written `bucketBy(n, key).sortBy(key)` as parquet
  * data-source tables in the session catalog (no Hive required): each
  * bucket file holds exactly the rows whose `hash(key) % n` matches, so a
  * join of two tables bucketed the same way is already co-partitioned —
  * the physical plan is a SortMergeJoin over the bucketed scans with NO
  * Exchange on either side (asserted in BucketedSpec). At production
  * scale this turns the dominant join of every pipeline run from a
  * full-corpus shuffle into a metadata lookup, paid once at write time.
  */
object Bucketed {

  /** Writes `left` and `right` bucketed+sorted by `key` into the session
    * catalog under `tablePrefix`, then returns their co-located equi-join.
    * Overwrites any previous tables of the same name (idempotent across
    * reruns in one warehouse).
    *
    * `reuseExisting = true` skips the write when BOTH tables are already
    * in the session catalog AND their stamped fingerprint (input files,
    * canonicalized logical plan, key, nBuckets — a table property written
    * at save time) matches the current call — a prefix reused against
    * different inputs (e.g. two scale-factor dirs in one session), a
    * differently filtered/projected frame over the same files, or a
    * changed spec rebuilds transparently instead of silently joining the
    * first build's data. */
  def coLocatedJoin(
      spark: SparkSession,
      left: DataFrame,
      right: DataFrame,
      key: String,
      nBuckets: Int,
      tablePrefix: String,
      reuseExisting: Boolean = false,
  ): DataFrame = {
    require(nBuckets > 0, s"coLocatedJoin: nBuckets must be positive, got $nBuckets")
    // the prefix is interpolated into SQL identifiers: a '-' would fail
    // the DROP/CREATE parse and a '.' would silently target another
    // database while the path math assumed the default one
    require(tablePrefix.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"coLocatedJoin: tablePrefix must be a plain identifier, got '$tablePrefix'")
    val (lName, rName) = (s"${tablePrefix}_l", s"${tablePrefix}_r")
    // identity of (inputs, TRANSFORMATION, spec): file-backed frames
    // contribute their file list, and every frame contributes its
    // canonicalized analyzed plan — two differently filtered/projected
    // frames over the same files (or two non-file frames) must NOT share
    // a fingerprint, or reuseExisting would serve the first build's data
    def fingerprint(df: DataFrame): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val plan = df.queryExecution.analyzed.canonicalized
      // toString captures structure (filters/projections/paths) but elides
      // a LocalRelation's rows; semanticHash is case-class equality over
      // the canonicalized tree, so it covers in-memory data too
      val basis = df.inputFiles.sorted.mkString("\n") +
        s"\n$plan\n${df.queryExecution.analyzed.semanticHash()}\n$key\n$nBuckets"
      md.digest(basis.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def stampedFingerprint(name: String): Option[String] =
      spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(name))
        .properties.get("graft.fingerprint")
    val (lFp, rFp) = (fingerprint(left), fingerprint(right))
    def save(df: DataFrame, name: String, fp: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      // a warehouse dir left by a PREVIOUS session is invisible to this
      // catalog but still blocks CREATE (LOCATION_ALREADY_EXISTS) —
      // clear the orphan location before writing
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(name)))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      df.write.mode("overwrite").format("parquet")
        .bucketBy(nBuckets, key).sortBy(key).saveAsTable(name)
      spark.sql(s"ALTER TABLE $name SET TBLPROPERTIES ('graft.fingerprint'='$fp')")
    }
    val reusable = reuseExisting &&
      spark.catalog.tableExists(lName) && spark.catalog.tableExists(rName) &&
      stampedFingerprint(lName).contains(lFp) && stampedFingerprint(rName).contains(rFp)
    if (!reusable) {
      save(left, lName, lFp)
      save(right, rName, rFp)
    }
    spark.table(lName).join(spark.table(rName), key)
  }
}
