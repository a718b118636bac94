package graft.io

/** Shared executor-side file access for the StAX parsers (mzML / mzXML /
  * mzIdentML / PRIDE XML).
  *
  * Routed through the Hadoop FileSystem API so these sources accept the
  * SAME URI schemes as the `spark.read`-based ones (file:, hdfs:, s3a:,
  * ...) — with `java.nio` they would half-work per format: MGF/PKL read
  * `hdfs://...` fine while the XML formats threw NoSuchFileException at
  * task time. Executors resolve the scheme against the cluster Hadoop
  * configuration on their classpath (the standard deployment); bare paths
  * resolve as local files.
  */
private[io] object IoSource {

  def open(path: String): java.io.InputStream = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = new org.apache.hadoop.conf.Configuration()
    new java.io.BufferedInputStream(p.getFileSystem(conf).open(p), 1 << 16)
  }

  def baseName(path: String): String = new org.apache.hadoop.fs.Path(path).getName
}
