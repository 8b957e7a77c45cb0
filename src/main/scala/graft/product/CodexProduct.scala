package graft.product

import graft.ops.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The assembled CODEX data-product pipeline — the Spark-native equivalent
  * of the reference's `concatenate.py:main` (`bin/concatenate.py:345-468`),
  * producing the annotated star-schema bundle SURVEY.md §1.1(3) maps the
  * AnnData/MuData composite onto:
  *
  *   obs(cell_id, dataset, original_obs_id, tissue, + donor columns)
  *   var(channel)                       — the channel universe
  *   x_long(cell_id, channel, total, mean)
  *   obsm_centers(cell_id, x, y)
  *   varm(channel, dataset, uniprot_accession_number, rr_id, channel_id)
  *   obsp_edges(src, dst, weight)       — global block-diagonal indices
  *   uns                                — single-row manifest of scalars
  *
  * Where the reference loops datasets serially and materializes everything
  * in RAM, every step here is a DataFrame transformation over tables
  * carrying a `dataset` key: per-dataset work parallelizes as partitions,
  * global merges are unions + small broadcast joins, and the only
  * wide shuffles are the per-dataset window for deterministic cell indices
  * and the final obsp re-index joins.
  */
object CodexProduct {

  /** Per-dataset inputs in long/tidy form (the post-ingest shape; the HDF5→
    * parquet conversion S-5 happens in the ingest connector).
    */
  case class DatasetInputs(
      xLong: DataFrame,      // (dataset, original_obs_id, channel, total, mean)
      centers: DataFrame,    // (dataset, ID, x, y)
      edges: DataFrame,      // (dataset, row, col, value)  1-based local idx
      labels: DataFrame,     // (dataset, idx, cell_id)     1-based file order
      antibodies: DataFrame) // (dataset, antibody_name, uniprot_accession_number, rr_id, channel_id)

  /** O-3 (`bin/concatenate.py:339-342`): leaf datasets of the manifest. */
  def leafDatasets(manifest: DataFrame): DataFrame =
    manifest.filter(col("immediate_descendant_ids").isNull ||
      length(trim(col("immediate_descendant_ids"))) === 0)

  /** obs assembly (`bin/concatenate.py:266-275`): one row per cell with the
    * F-4 composite key, J-1 donor metadata joined from the (broadcast)
    * manifest, and EPIC constants (`bin/concatenate.py:451-453`).
    */
  def buildObs(xLong: DataFrame, manifest: DataFrame,
               tissue: String): DataFrame = {
    val cells = xLong.select(col("dataset"), col("original_obs_id"))
      .distinct()
    cells
      .withColumn("cell_id",
        concat_ws("-", col("dataset"), col("original_obs_id")))
      .join(broadcast(
          manifest.select(col("uuid"), col("hubmap_id"),
            col("age").cast("double").as("age"), col("sex"),
            col("height").cast("double").as("height"),
            col("weight").cast("double").as("weight"),
            col("bmi").cast("double").as("bmi"),
            col("cause_of_death"), col("race"))),
        col("dataset") === col("uuid"), "inner")
      .drop("uuid")
      .withColumn("tissue", lit(tissue))
      .withColumn("object_type", lit("ftu"))
      .withColumn("analyte_class", lit("Protein"))
  }

  /** F-1 (`bin/concatenate.py:63-71`): strip `Anti-` prefix and
    * `antibody` suffixes from an analyte/channel name.
    */
  def stripAnalyteName(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(regexp_replace(
      regexp_replace(c, "^Anti-", ""), "\\s+antibody$", ""),
      "antibody$", ""))

  /** F-1 + J-3 (`bin/concatenate.py:187-192`): vectorized channel-name
    * standardization — regex strip then alias-table lookup with identity
    * fallback. One projection + one broadcast join; the reference's
    * per-row iterrows loop disappears.
    */
  def normalizeChannels(df: DataFrame, channelCol: String,
                        aliases: DataFrame): DataFrame =
    Relational.aliasNormalize(
      df.withColumn(channelCol, stripAnalyteName(col(channelCol))),
      channelCol, aliases, channelCol)

  /** var assembly + O-7 channel filter (`bin/concatenate.py:443-450`):
    * union of per-dataset channel sets, minus unidentifiable
    * `Channel:<n>:<n>` names and blanks.
    */
  def buildVar(xLong: DataFrame): DataFrame =
    xLong.select(col("channel")).distinct()
      .filter(!col("channel").rlike("^Channel:\\d+:\\d+$") &&
        !lower(col("channel")).contains("blank"))

  /** varm assembly (J-4, `bin/concatenate.py:195-221`): long-form channel
    * annotations per dataset — first match per (dataset, channel) made
    * deterministic, then O-23 reindexed to the final var universe.
    */
  def buildVarm(varFinal: DataFrame, antibodies: DataFrame): DataFrame = {
    // nulls LAST: with ascending null-first ordering a duplicate antibody
    // row with empty annotations would win over the annotated one
    val firstMatch = Relational.firstMatchPerKey(
      antibodies, Seq("dataset", "antibody_name"),
      Seq(col("uniprot_accession_number").asc_nulls_last,
        col("rr_id").asc_nulls_last, col("channel_id").asc_nulls_last))
    varFinal
      .join(firstMatch.withColumnRenamed("antibody_name", "channel"),
        Seq("channel"), "left")
      .select("channel", "dataset", "uniprot_accession_number", "rr_id",
        "channel_id")
  }

  /** O-5 (`bin/concatenate.py:281-286`): centers for cells present in obs,
    * keyed by the composite cell_id.
    */
  def buildCenters(centers: DataFrame, obs: DataFrame): DataFrame =
    centers
      .withColumn("cell_id",
        concat_ws("-", col("dataset"), col("ID").cast("string")))
      .join(obs.select("cell_id"), Seq("cell_id"), "left_semi")
      .select("cell_id", "x", "y")

  /** The adjacency path (S-6/S-7 + O-6 + J-5 + O-22,
    * `bin/concatenate.py:310-336,413-416`): per-dataset 1-based COO edges +
    * label files → one global edge list.
    *
    *  1. keep labels whose cell id exists in the expression matrix (O-6);
    *  2. per dataset, assign kept labels a dense local index (J-5) — the
    *     explicit replacement for pandas positional slicing;
    *  3. per-dataset offsets = cumulative kept-cell counts (O-22);
    *  4. two equi joins remap (row, col) → global (src, dst).
    *
    * The per-dataset window partitions by dataset (parallel across
    * datasets); the offsets table is one row per dataset (broadcast).
    */
  def buildObsp(edges: DataFrame, labels: DataFrame,
                xLong: DataFrame): DataFrame = {
    val matrixCells = xLong
      .select(col("dataset"), col("original_obs_id").cast("long")
        .as("cell_id")).distinct()
    val kept = labels.join(matrixCells, Seq("dataset", "cell_id"),
      "left_semi")
    val reindexed = Relational.denseIndex(kept, "local_idx",
      Seq(col("idx")), Seq(col("dataset")))
    val sizes = reindexed.groupBy(col("dataset"))
      .agg(count(lit(1)).as("n"))
    val offsets = Relational.blockOffsets(sizes, "dataset", "n",
      col("dataset"), "offset")
    val withOffsets = reindexed.join(broadcast(offsets
        .select(col("dataset"), col("offset"))), Seq("dataset"))
      .select(col("dataset"), col("idx"),
        (col("local_idx") + col("offset")).cast("long").as("global_idx"))
    val src = withOffsets.toDF("dataset", "idx", "src")
    val dst = withOffsets.toDF("dataset", "idx", "dst")
    edges
      .join(src, edges("dataset") === src("dataset") &&
        edges("row") === src("idx"))
      .drop(src("dataset")).drop("idx")
      .join(dst, edges("dataset") === dst("dataset") &&
        edges("col") === dst("idx"))
      .select(col("src"), col("dst"), col("value").as("weight"))
  }

  /** Final x_long: composite key + channel filter applied (row filter in
    * long form — pushes below the union, unlike the reference's
    * last-minute column slice).
    */
  def buildXLong(xLong: DataFrame, varFinal: DataFrame): DataFrame =
    xLong
      .withColumn("cell_id",
        concat_ws("-", col("dataset"), col("original_obs_id")))
      .join(broadcast(varFinal), Seq("channel"), "left_semi")
      .select("cell_id", "channel", "total", "mean")

  /** uns scalars (`bin/concatenate.py:433-438`) as a single-row frame.
    * `datasets` carries HuBMAP IDs, matching the reference checkpoint
    * (`bin/concatenate.py:437` stores `processed_hbmids` in
    * `uns['datasets']`); the UUIDs ride in a separate `dataset_uuids`
    * field, mirroring create_json's distinct "Dataset UUIDs" list
    * (`bin/concatenate.py:154-177`).
    */
  def buildUns(spark: SparkSession, obs: DataFrame, tissue: String,
               productUuid: String, creationTime: String): DataFrame = {
    import spark.implicits._
    val pairs = obs.select("dataset", "hubmap_id").distinct()
      .orderBy("dataset").collect()
      .map(r => (r.getString(0), r.getString(1)))
    Seq((productUuid, tissue, creationTime,
      pairs.map(_._2).mkString(","), pairs.map(_._1).mkString(","),
      obs.count()))
      .toDF("uuid", "tissue", "creation_time", "datasets",
        "dataset_uuids", "total_cell_count")
  }

  /** F-13 (`make_uuids_tsv.py:105-156`): donor-metadata pivot. Input rows
    * carry two arrays of `{grouping_concept_preferred_term, data_value,
    * preferred_term}` structs (organ-donor and living-donor data; either
    * nullable); output is one row per donor with the 7 fixed columns.
    * Semantics preserved from the reference:
    *  - living-donor data OVERRIDES organ-donor data (the reference
    *    iterates organ first, living second, last write wins) — expressed
    *    as max_by over the concatenation position, so it is deterministic
    *    under Spark's unordered execution;
    *  - Sex / Cause of Death / Race take `preferred_term`, the numeric
    *    concepts take `data_value`.
    */
  val donorConcepts: Seq[String] = Seq(
    "Age", "Sex", "Height", "Weight", "Body mass index", "Cause of death",
    "Race")

  def donorPivot(donors: DataFrame, donorIdCol: String): DataFrame = {
    val termConcepts = Seq("Sex", "Cause of death", "Race")
    // explode each side with a source tag instead of concat'ing the arrays
    // (concat over a null-able array needs a typed empty-array literal);
    // position = sourceTag · 1e6 + in-array pos reproduces organ-then-
    // living write order. posexplode_outer keeps all-null donors present.
    def side(arrCol: String, srcIdx: Int): DataFrame = donors
      .select(col(donorIdCol), posexplode_outer(col(arrCol))
        .as(Seq("pos", "entry")))
      .select(col(donorIdCol),
        (lit(srcIdx * 1000000L) + coalesce(col("pos"), lit(0)))
          .as("write_order"),
        col("entry.grouping_concept_preferred_term").as("concept"),
        when(col("entry.grouping_concept_preferred_term")
            .isin(termConcepts: _*), col("entry.preferred_term"))
          .otherwise(col("entry.data_value")).as("value"))
    side("organ_donor_data", 0).union(side("living_donor_data", 1))
      .groupBy(col(donorIdCol))
      .pivot("concept", donorConcepts)
      .agg(max_by(col("value"), col("write_order")))
  }

  /** Full product bundle. */
  case class Bundle(obs: DataFrame, varDf: DataFrame, xLong: DataFrame,
                    obsmCenters: DataFrame, varm: DataFrame,
                    obspEdges: DataFrame, uns: DataFrame)

  /** Empty alias table for callers with no alias dictionary. */
  private def emptyAliases(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String)].toDF("alias_lower", "canonical")
  }

  def build(spark: SparkSession, manifest: DataFrame, in: DatasetInputs,
            tissue: String, productUuid: String, creationTime: String,
            channelAliases: Option[DataFrame] = None): Bundle = {
    val leaves = leafDatasets(manifest)
    val aliases = channelAliases.getOrElse(emptyAliases(spark))
    // F-1 + J-3 first (`bin/concatenate.py:246,187-192`): channel names and
    // antibody names are normalized BEFORE any var/varm/x assembly, so the
    // annotation join keys agree even when inputs carry raw
    // 'Anti-X'/'… antibody' names or aliased spellings.
    val xNorm = normalizeChannels(in.xLong, "channel", aliases)
    val antibodiesNorm = normalizeChannels(in.antibodies, "antibody_name",
      aliases)
    val xLeaf = xNorm.join(
      broadcast(leaves.select(col("uuid"))),
      xNorm("dataset") === col("uuid"), "left_semi")
    val varFinal = buildVar(xLeaf)
    val obs = buildObs(xLeaf, leaves, tissue)
    Bundle(
      obs = obs,
      varDf = varFinal,
      xLong = buildXLong(xLeaf, varFinal),
      obsmCenters = buildCenters(in.centers, obs),
      varm = buildVarm(varFinal, antibodiesNorm),
      obspEdges = buildObsp(in.edges, in.labels, xLeaf),
      uns = buildUns(spark, obs, tissue, productUuid, creationTime))
  }

  /** K-1 sink: the engine-native product layout — one partitioned parquet
    * directory per component table plus the K-2 metadata JSON
    * (`bin/concatenate.py:154-177,454-468`) and the reference's native
    * single-file artifact `{tissue}_raw.h5mu` (`writeH5mu`).
    */
  def write(bundle: Bundle, outDir: String): Unit = {
    bundle.obs.write.mode("overwrite").parquet(s"$outDir/obs")
    bundle.varDf.write.mode("overwrite").parquet(s"$outDir/var")
    bundle.xLong.write.mode("overwrite").parquet(s"$outDir/x_long")
    bundle.obsmCenters.write.mode("overwrite")
      .parquet(s"$outDir/obsm_centers")
    bundle.varm.write.mode("overwrite").parquet(s"$outDir/varm")
    bundle.obspEdges.write.mode("overwrite").parquet(s"$outDir/obsp_edges")
    bundle.uns.coalesce(1).write.mode("overwrite").json(s"$outDir/uns")
    writeH5mu(bundle, outDir)
  }

  import graft.sources.Hdf5Writer
  import Hdf5Writer.{Attr, Attributed, DoubleMatrix, DoubleMatrixStream,
    DoubleVector, DoubleVectorStream, Group, LongVector, LongVectorStream,
    Node, StrArrayAttr, StrAttr, StringVector}

  /** Bundle columns → name-keyed HDF5 vector nodes by Spark dtype
    * (double → float64 with NaN for null; long → int64 when non-null,
    * PROMOTED to float64 with NaN when any null is present — pandas
    * promotes a nullable int column to float64+NaN, never int 0;
    * anything else → fixed-length strings with "" for null — the pandas
    * object-column convention the reference's stores use).
    */
  private def columnNodes(rows: Array[org.apache.spark.sql.Row],
                          schema: org.apache.spark.sql.types.StructType,
                          skip: Set[String]): Seq[(String, Node)] = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    schema.fields.zipWithIndex
      .filterNot { case (f, _) => skip.contains(f.name) }
      .map { case (f, i) =>
        f.dataType match {
          case DoubleType => f.name -> DoubleVector(rows.map(r =>
            if (r.isNullAt(i)) Double.NaN else r.getDouble(i)))
          case LongType if rows.exists(_.isNullAt(i)) =>
            f.name -> DoubleVector(rows.map(r =>
              if (r.isNullAt(i)) Double.NaN else r.getLong(i).toDouble))
          case LongType => f.name -> LongVector(rows.toSeq.map(_.getLong(i)))
          case _ => f.name -> StringVector(rows.toSeq.map(r =>
            if (r.isNullAt(i)) "" else r.get(i).toString))
        }
      }.toSeq
  }

  /** Streaming equivalent of [[columnNodes]]: rows are consumed from an
    * iterator exactly once into typed primitive builders, so the driver
    * never holds an `Array[Row]` (JVM Rows cost ~3-5× their payload).
    * Same dtype mapping, including the pandas nullable-long → float64 +
    * NaN promotion.
    */
  private final class ColumnBuilders(
      schema: org.apache.spark.sql.types.StructType, skip: Set[String]) {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    private val fields = schema.fields.zipWithIndex
      .filterNot { case (f, _) => skip.contains(f.name) }
    private val doubles = scala.collection.mutable.Map.empty[Int,
      scala.collection.mutable.ArrayBuilder.ofDouble]
    private val longs = scala.collection.mutable.Map.empty[Int,
      (scala.collection.mutable.ArrayBuilder.ofLong,
        scala.collection.mutable.ArrayBuffer[Int])]
    private val strings = scala.collection.mutable.Map.empty[Int,
      scala.collection.mutable.ArrayBuffer[String]]
    private var n = 0
    fields.foreach { case (f, i) =>
      f.dataType match {
        case DoubleType =>
          doubles(i) = new scala.collection.mutable.ArrayBuilder.ofDouble
        case LongType =>
          longs(i) = (new scala.collection.mutable.ArrayBuilder.ofLong,
            scala.collection.mutable.ArrayBuffer.empty[Int])
        case _ => strings(i) = scala.collection.mutable.ArrayBuffer
          .empty[String]
      }
    }
    def add(r: org.apache.spark.sql.Row): Unit = {
      fields.foreach { case (f, i) =>
        f.dataType match {
          case DoubleType => doubles(i) +=
            (if (r.isNullAt(i)) Double.NaN else r.getDouble(i))
          case LongType =>
            val (b, nulls) = longs(i)
            if (r.isNullAt(i)) { b += 0L; nulls += n }
            else b += r.getLong(i)
          case _ => strings(i) +=
            (if (r.isNullAt(i)) "" else r.get(i).toString)
        }
      }
      n += 1
    }
    def result(): Seq[(String, Node)] = {
      import org.apache.spark.sql.types.{DoubleType, LongType}
      fields.map { case (f, i) =>
        f.dataType match {
          case DoubleType => f.name -> (DoubleVector(doubles(i).result())
            : Node)
          case LongType =>
            val (b, nulls) = longs(i)
            val vs = b.result()
            if (nulls.isEmpty) f.name -> (LongVector(vs.toSeq): Node)
            else { // pandas promotion: nullable int → float64 + NaN
              val ds = vs.map(_.toDouble)
              nulls.foreach(j => ds(j) = Double.NaN)
              f.name -> (DoubleVector(ds): Node)
            }
          case _ => f.name -> (StringVector(strings(i).toSeq): Node)
        }
      }.toSeq
    }
  }

  // anndata/mudata on-disk encoding attributes (public anndata on-disk
  // format spec v0.1.0 element encodings; mudata .h5mu spec)
  private def enc(t: String, v: String): Seq[(String, Attr)] =
    Seq("encoding-type" -> StrAttr(t), "encoding-version" -> StrAttr(v))
  private def encWrap(n: Node): Node = n match {
    case _: StringVector => Attributed(n, enc("string-array", "0.2.0"))
    case _: DoubleMatrix | _: DoubleMatrixStream | _: DoubleVector |
        _: DoubleVectorStream | _: LongVector | _: LongVectorStream =>
      Attributed(n, enc("array", "0.2.0"))
    case other => other
  }
  private def encWrapAll(cols: Seq[(String, Node)]): Seq[(String, Node)] =
    cols.map { case (name, n) => name -> encWrap(n) }

  /** The reference's PRIMARY output artifact: `{tissue}_raw.h5mu`
    * (`bin/concatenate.py:346,454-456` — `MuData({f"{uuid}_raw": adata})
    * .write(...)`), emitted with the clean-room `Hdf5Writer` in the same
    * structural subset `Hdf5Reader`/the S-5 ingest consume: the mod
    * group carries dense X (total) and the `mean_expression` layer
    * (absent cell×channel entries NaN, the pandas outer-concat fill),
    * obs/var with `_index`, spatial centers as `obsm/X_spatial`,
    * long-form antibody annotations under `varm/antibodies`, the O-22
    * global-index adjacency as COO triplets under `obsp/adjacency`, the
    * uns scalars, and the top-level `uns/epic_type = analyses` EPIC tag.
    * Groups and datasets carry the anndata/mudata ENCODING ATTRIBUTES
    * (`encoding-type`/`encoding-version`, dataframe `_index` +
    * `column-order`, root `MuData`/`mod-order`) as real HDF5 attribute
    * messages. Remaining structural divergence from a mudata-written
    * file, documented rather than hidden: fixed-length null-terminated
    * strings where h5py writes variable-length UTF-8, old-style
    * symbol-table groups, and a dense (never CSR) X — so the artifact
    * is the reference's h5mu STRUCTURE with this engine's string/group
    * encoding subset.
    *
    * Driver-side by design: an `.h5mu` is a single sequential file, so
    * this sink is bounded by ONE product's cells × channels matrix —
    * exactly the reference's own in-RAM AnnData model
    * (`bin/concatenate.py:420-456`); the distributed axis is across
    * products, never within one (the `codex_multi_tissue` query in
    * `queries/Round7Queries.scala` demonstrates it: N per-tissue builds
    * in parallel, one artifact each). All other components stay
    * distributed in the parquet bundle.
    *
    * Driver MEMORY is bounded by the produced file, not by Row
    * materializations: the two dense matrices stream through sorted
    * `toLocalIterator` passes straight into the writer's append buffer
    * (`DoubleMatrixStream` — no driver-side matrix array, no Row
    * array), obs/edges/centers stream into typed primitive builders,
    * and only metadata-sized frames (var universe, varm annotations,
    * the single uns row) are collect()ed.
    */
  def writeH5mu(bundle: Bundle, outDir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val unsRow = bundle.uns.collect()(0)
    val unsSchema = bundle.uns.schema
    val uuid = unsRow.getString(unsSchema.fieldIndex("uuid"))
    val tissue = unsRow.getString(unsSchema.fieldIndex("tissue"))
    // var universe: metadata-sized (channel names)
    val vars = bundle.varDf.orderBy(col("channel")).collect()
      .map(_.getString(0))
    val varIdx = vars.zipWithIndex.toMap
    // obs: ONE sorted streaming pass → ids + typed column builders
    val obsSchema = bundle.obs.schema
    val cellAt = obsSchema.fieldIndex("cell_id")
    val obsIdsB = Array.newBuilder[String]
    val obsCols = new ColumnBuilders(obsSchema, Set("cell_id"))
    bundle.obs.orderBy(col("cell_id")).toLocalIterator().asScala
      .foreach { r => obsIdsB += r.getString(cellAt); obsCols.add(r) }
    val obsIds = obsIdsB.result()
    val obsIdx = obsIds.zipWithIndex.toMap
    val (nObs, nVar) = (obsIds.length, vars.length)
    // dense matrices: sorted long-form entries arrive in row-major
    // (cell, channel) order — obsIds/vars were sorted by the same Spark
    // comparators — so each matrix streams through a gap-filling
    // iterator straight into the file buffer. Two passes (X, mean):
    // recomputing the sorted scan costs one extra job; holding a
    // second driver-side matrix would cost the memory bound.
    def matrixStream(valueCol: String): () => Iterator[Double] = () => {
      // BOTH value columns ride the sort keys (in fixed order), so a
      // (cell, channel) duplicate resolves to the SAME winning row in
      // the X pass and the mean pass: every row is emitted (a null
      // value column as NaN, never skipped), so gapFill's first-wins
      // picks the min-by-(total, mean) row in both passes — the two
      // matrices never pair a total and a mean that exist in no single
      // input row, even when the winning row carries a null.
      val vAt = if (valueCol == "total") 2 else 3
      val entries = bundle.xLong
        .select(col("cell_id"), col("channel"), col("total"), col("mean"))
        .orderBy(col("cell_id"), col("channel"), col("total"),
          col("mean"))
        .toLocalIterator().asScala
        .flatMap { r =>
          (obsIdx.get(r.getString(0)), varIdx.get(r.getString(1))) match {
            case (Some(i), Some(j)) =>
              Iterator.single((i.toLong * nVar + j,
                if (r.isNullAt(vAt)) Double.NaN else r.getDouble(vAt)))
            case _ => Iterator.empty
          }
        }
      gapFill(entries, nObs.toLong * nVar)
    }
    // centers: nObs×2 primitive array filled from an (unsorted) stream
    val centers = Array.fill(nObs * 2)(Double.NaN)
    bundle.obsmCenters.select("cell_id", "x", "y").toLocalIterator()
      .asScala.foreach { r =>
        obsIdx.get(r.getString(0)).foreach { i =>
          if (!r.isNullAt(1)) centers(i * 2) = r.getDouble(1)
          if (!r.isNullAt(2)) centers(i * 2 + 1) = r.getDouble(2)
        }
      }
    // varm: metadata-sized (channels × datasets annotation rows)
    val varmRows = bundle.varm
      .orderBy(col("channel"), col("dataset"), col("channel_id"))
      .collect()
    // edges: one sorted pass into primitive builders (no Row array)
    val srcB = new scala.collection.mutable.ArrayBuilder.ofLong
    val dstB = new scala.collection.mutable.ArrayBuilder.ofLong
    val wB = new scala.collection.mutable.ArrayBuilder.ofDouble
    bundle.obspEdges.select(col("src"), col("dst"), col("weight"))
      .orderBy(col("src"), col("dst")).toLocalIterator().asScala
      .foreach { r => srcB += r.getLong(0); dstB += r.getLong(1)
        wB += r.getDouble(2) }
    val (srcs, dsts, wgts) = (srcB.result(), dstB.result(), wB.result())
    val obsColNodes = obsCols.result()
    val dictEnc = enc("dict", "0.1.0")
    def dataframeAttrs(colOrder: Seq[String]): Seq[(String, Attr)] =
      enc("dataframe", "0.2.0") ++ Seq(
        "_index" -> StrAttr("_index"),
        "column-order" -> StrArrayAttr(colOrder))
    val root = Group(Seq(
      "mod" -> Attributed(Group(Seq(s"${uuid}_raw" -> Attributed(Group(Seq(
        "X" -> encWrap(DoubleMatrixStream(nObs, nVar,
          matrixStream("total"))),
        "layers" -> Attributed(Group(Seq(
          "mean_expression" -> encWrap(DoubleMatrixStream(nObs, nVar,
            matrixStream("mean"))))), dictEnc),
        "obs" -> Attributed(
          Group(("_index" -> encWrap(StringVector(obsIds.toSeq))) +:
            encWrapAll(obsColNodes)),
          dataframeAttrs(obsColNodes.map(_._1))),
        "var" -> Attributed(
          Group(Seq("_index" -> encWrap(StringVector(vars.toSeq)))),
          dataframeAttrs(Nil)),
        "obsm" -> Attributed(Group(Seq(
          "X_spatial" -> encWrap(DoubleMatrix(nObs, 2, centers)))),
          dictEnc),
        "varm" -> Attributed(Group(Seq("antibodies" ->
          Attributed(
            Group(encWrapAll(
              columnNodes(varmRows, bundle.varm.schema, Set.empty))),
            dictEnc))), dictEnc),
        "obsp" -> Attributed(Group(Seq("adjacency" -> Attributed(Group(Seq(
          "src" -> encWrap(LongVector(srcs.toSeq)),
          "dst" -> encWrap(LongVector(dsts.toSeq)),
          "weight" -> encWrap(DoubleVector(wgts)))), dictEnc))), dictEnc),
        "uns" -> Attributed(Group(encWrapAll(
          columnNodes(Array(unsRow), unsSchema, Set.empty)) :+
          ("protocol" -> encWrap(StringVector(Seq(
            "https://github.com/hubmapconsortium/codex-data-products"))))),
          dictEnc))),
        enc("anndata", "0.1.0")))),
        dictEnc ++ Seq("mod-order" -> StrArrayAttr(Seq(s"${uuid}_raw")))),
      "uns" -> Attributed(Group(Seq(
        "epic_type" -> encWrap(StringVector(Seq("analyses"))))), dictEnc)))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, s"${tissue}_raw.h5mu"),
      Hdf5Writer.writeAttributed(root, enc("MuData", "0.1.0")))
    ()
  }

  /** Row-major gap filler: sorted sparse (position, value) entries →
    * a dense stream of `n` doubles with NaN at absent positions.
    * Out-of-order or duplicate positions are dropped (first wins). */
  private def gapFill(entries: Iterator[(Long, Double)],
                      n: Long): Iterator[Double] = new Iterator[Double] {
    private var pos = 0L
    private var pending: (Long, Double) = null
    def hasNext: Boolean = pos < n
    def next(): Double = {
      while (pending == null && entries.hasNext) {
        val e = entries.next()
        if (e._1 >= pos) pending = e
      }
      val v =
        if (pending != null && pending._1 == pos) {
          val x = pending._2; pending = null; x
        } else Double.NaN
      pos += 1
      v
    }
  }
}
