package graft.odf

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.util.Using

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame

/** A14: single-file parquet sink (/root/reference/src/engine.rs:564-641).
  *
  * Contract: exactly one parquet file appears at the requested absolute path;
  * snappy compression, parquet writer v1, dictionary encoding on (the
  * reference enables it per-column for `op`/`system_time`; parquet-mr — the
  * writer Spark uses — has dictionary on for every column by default, a
  * superset). Returns the number of rows written, read back from the file
  * footer (exact, no second scan of the data).
  *
  * Spark writes directories of part files, so we write `<path>.tmp-spark/`
  * and move the lone `part-*.parquet` to the target — the same rename dance
  * the reference performs for DataFusion's extension quirk
  * (engine.rs:607-627).
  *
  * Scale note: `coalesce(1)` here is the ODF single-file contract, not an
  * engine limitation — everything upstream of this stage remains distributed,
  * and `coalesce` (unlike `repartition`) adds no shuffle.
  */
object ParquetSink {

  def writeSingleFile(df: DataFrame, targetPath: String): Long = {
    val target = Paths.get(targetPath).toAbsolutePath
    val tmpDir = target.getParent.resolve(target.getFileName.toString + ".tmp-spark")

    df.coalesce(1)
      .write
      .mode("overwrite")
      .option("compression", "snappy")
      .parquet(tmpDir.toString)

    val part = Using.resource(Files.list(tmpDir)) { stream =>
      val it = stream.iterator()
      var found: Option[Path] = None
      while (it.hasNext && found.isEmpty) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.startsWith("part-") && n.endsWith(".parquet")) found = Some(p)
      }
      found.getOrElse(throw new IllegalStateException(s"no part file written under $tmpDir"))
    }

    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(tmpDir)
    rowCount(target)
  }

  /** Row count from the parquet footer — exact and O(footer). */
  def rowCount(file: Path): Long =
    Using.resource(ParquetFileReader.open(
      HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toUri), new Configuration()))) { r =>
      r.getRecordCount
    }

  private def deleteRecursively(dir: Path): Unit = {
    if (Files.exists(dir)) {
      Using.resource(Files.walk(dir)) { stream =>
        stream.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      }
    }
    ()
  }
}
