package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source readers for every format the reference consumes (SURVEY.md §2.1).
  * All readers produce schema-explicit DataFrames; none infer types at scan
  * time (inference = an extra pass over the data, unacceptable at 100 TB).
  */
object Sources {

  /** S-1 (`bin/concatenate.py:347`): manifest TSV, tab-separated, header,
    * all-string on ingest (the reference's `dtype=str`). `age` is cast
    * downstream (F-8), mirroring `bin/concatenate.py:305`.
    */
  val manifestSchema: StructType = StructType(Seq(
    "uuid", "hubmap_id", "immediate_ancestor_ids", "immediate_descendant_ids",
    "age", "sex", "height", "weight", "bmi", "cause_of_death", "race"
  ).map(StructField(_, StringType, nullable = true)))

  def manifestTsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t").option("header", "true")
      .schema(manifestSchema)
      .csv(path)

  /** S-2 (`bin/concatenate.py:249`): per-dataset antibodies TSV. */
  val antibodiesSchema: StructType = StructType(Seq(
    "antibody_name", "uniprot_accession_number", "rr_id", "channel_id"
  ).map(StructField(_, StringType, nullable = true)))

  def antibodiesTsv(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("sep", "\t").option("header", "true")
      .schema(antibodiesSchema).csv(paths: _*)

  /** S-4 (`bin/concatenate.py:281`): cell-centers CSV `ID,x,y`. */
  val centersSchema: StructType = StructType(Seq(
    StructField("ID", LongType), StructField("x", DoubleType),
    StructField("y", DoubleType)))

  def centersCsv(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("header", "true").schema(centersSchema).csv(paths: _*)

  /** S-6 (`bin/concatenate.py:313`): MatrixMarket coordinate scan → edge
    * list. MatrixMarket is 1-based; line 1 is the `%%MatrixMarket` banner,
    * the first non-comment line is `rows cols nnz`, then `i j value`
    * triples. COO triples ARE the relational form of a sparse matrix, so
    * this reader goes straight to (row, col, value) with no driver-side
    * materialization — a 100 TB .mtx streams through the text reader in
    * parallel splits.
    */
  def matrixMarket(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    // zipWithIndex gives exact global line numbers with one extra (cheap,
    // metadata-only) job — unlike monotonically_increasing_id it is stable
    // across splits, so the dims/nnz header line is identified exactly even
    // when the file spans many partitions.
    val indexed = spark.sparkContext.textFile(path).zipWithIndex()
    val nonComment = indexed.filter { case (l, _) =>
      val t = l.trim; t.nonEmpty && !t.startsWith("%")
    }
    if (nonComment.isEmpty()) {
      import org.apache.spark.sql.types._
      return spark.createDataFrame(spark.sparkContext.emptyRDD[
        org.apache.spark.sql.Row], StructType(Seq(
        StructField("row", LongType), StructField("col", LongType),
        StructField("value", DoubleType))))
    }
    val headerIdx = nonComment.map(_._2).min() // first non-comment = dims line
    nonComment
      .filter { case (_, i) => i != headerIdx }
      .map { case (l, _) =>
        val p = l.trim.split("\\s+")
        (p(0).toLong, p(1).toLong,
          if (p.length > 2) p(2).toDouble else 1.0)
      }
      .toDF("row", "col", "value")
  }

  /** S-7 (`bin/concatenate.py:314-316`): whitespace-delimited label file —
    * one cell id per line, file line order = 1-based matrix index
    * (`bin/concatenate.py:322-328`). pandas gets the index positionally;
    * Spark makes it explicit (SURVEY.md §2.6): per-file line numbers are
    * recovered deterministically from the text source's offsets.
    * Label files are per-dataset (small); the global window per file is
    * bounded by one dataset's cell count.
    */
  def labels(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    // index among PARSED rows, not raw file lines: pandas read_csv skips
    // blank lines, and the adjacency matrix's 1-based indices refer to
    // positions among parsed label rows — numbering raw lines would
    // silently mis-join every edge after an interior blank line. Filter
    // first, then zipWithIndex over the surviving rows.
    spark.sparkContext.textFile(path)
      .map(_.trim).filter(_.nonEmpty)
      .zipWithIndex()
      .map { case (l, i) => (i + 1L, l.toLong) }
      .toDF("idx", "cell_id")
  }

  /** Multi-file indexed text scan: ONE distributed read over many files →
    * `(dataset, offset, line)` where `offset` is the BYTE offset of the
    * line within its own file (TextInputFormat's record key, exact even
    * when a file spans several splits) and `dataset` is the file's parent
    * directory name. This is the single-scan replacement for a per-file
    * read loop: 10k dataset files are one scan node with 10k splits, not
    * 10k union legs in the logical plan.
    */
  def indexedText(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapreduce.lib.input.{FileSplit, TextInputFormat}
    require(paths.nonEmpty, "indexedText needs at least one input file")
    spark.sparkContext.newAPIHadoopFile(
        paths.mkString(","), classOf[TextInputFormat],
        classOf[LongWritable], classOf[Text])
      .asInstanceOf[org.apache.spark.rdd.NewHadoopRDD[LongWritable, Text]]
      .mapPartitionsWithInputSplit { (split, iter) =>
        val ds = split.asInstanceOf[FileSplit].getPath.getParent.getName
        // Text/LongWritable instances are REUSED by the record reader —
        // extract immediately, before the iterator advances
        iter.map { case (off, line) => (ds, off.get, line.toString) }
      }
      .toDF("dataset", "offset", "line")
  }

  /** S-6 over MANY files in one scan: each file's first non-comment line
    * (the `rows cols nnz` dims header) is dropped via a per-dataset
    * min-offset broadcast join — one row per dataset, metadata-sized —
    * and the remaining lines parse to `(dataset, row, col, value)` COO
    * triples. Semantics per file are identical to [[matrixMarket]].
    */
  def matrixMarketAll(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val t = trim(col("line"))
    val lines = indexedText(spark, paths)
      .filter(t =!= "" && !t.startsWith("%"))
    val dims = lines.groupBy(col("dataset"))
      .agg(min(col("offset")).as("dims_off"))
    val p = split(trim(col("line")), "\\s+")
    lines.join(broadcast(dims), Seq("dataset"))
      .filter(col("offset") =!= col("dims_off"))
      .select(col("dataset"),
        p.getItem(0).cast("long").as("row"),
        p.getItem(1).cast("long").as("col"),
        coalesce(p.getItem(2).cast("double"), lit(1.0)).as("value"))
  }

  /** S-7 over MANY files in one scan: per-file 1-based index among parsed
    * (non-blank) rows, recovered as a row_number over byte offsets
    * partitioned by dataset — the window is bounded by one dataset's cell
    * count, exactly like the single-file reader. Output
    * `(dataset, idx, cell_id)`.
    */
  def labelsAll(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dataset")).orderBy(col("offset"))
    indexedText(spark, paths)
      .select(col("dataset"), col("offset"), trim(col("line")).as("l"))
      .filter(col("l") =!= "")
      .withColumn("idx", row_number().over(w).cast("long"))
      .select(col("dataset"), col("idx"), col("l").cast("long").as("cell_id"))
  }

  /** S-11 (`bin/concatenate.py:106-151`): directory-discovery scan → file
    * manifest `(dataset, kind, path)`. The reference os.walks serially; we
    * glob once per kind pattern via the Hadoop FileSystem and emit a small
    * driver-built DataFrame (file listings are metadata, not data).
    */
  def fileManifest(spark: SparkSession, rootDir: String,
                   kinds: Map[String, String]): DataFrame = {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val rows = kinds.toSeq.flatMap { case (kind, glob) =>
      val p = new org.apache.hadoop.fs.Path(s"$rootDir/$glob")
      val statuses = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
      statuses.map { st =>
        val path = st.getPath
        (path.getParent.getName, kind, path.toString)
      }
    }
    rows.toDF("dataset", "kind", "path")
  }

  /** S-8 (`bin/concatenate.py:85,100-102`): organ YAML lookup. The file is a
    * flat 2-level map (`CODE: {description: Name}`) — parsed by hand on the
    * driver (no YAML dependency available offline), broadcast as a small
    * DataFrame downstream.
    */
  def organLookup(yaml: String): Map[String, String] = {
    val entry = "^([A-Za-z0-9_]+):\\s*$".r
    val desc = "^\\s+description:\\s*(.+?)\\s*$".r
    var current: Option[String] = None
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    yaml.linesIterator.foreach {
      case entry(code) => current = Some(code)
      case desc(d) => current.foreach(c => out(c) = d.stripPrefix("\"").stripSuffix("\""))
      case _ => ()
    }
    out.toMap
  }

  /** The antibody alias dictionary (`bin/concatenate.py:26-42`) flattened to
    * (alias_lower, canonical) pairs — the join-ready form of a
    * str→(str|list[str]) dict.
    */
  def aliasTable(spark: SparkSession,
                 aliases: Map[String, Seq[String]]): DataFrame = {
    import spark.implicits._
    aliases.toSeq
      .flatMap { case (canonical, as) =>
        as.map(a => (a.trim.toLowerCase, canonical)) }
      .toDF("alias_lower", "canonical")
  }
}
