package graft.odf

import java.time.Instant

/** A15-A16: watermark + offset-interval metadata — pure arithmetic, no Spark.
  *
  * New output watermark = `min` over inputs of (`max` of each input's
  * explicit watermarks' event time); inputs with no watermarks are skipped;
  * `None` if no input carries any (/root/reference/src/engine.rs:310-324;
  * behavior test /root/reference/tests/tests/test_transform.rs:432-459).
  * The reference notes this must change if streaming aggregations/joins are
  * ever added — ODF "streaming" today is repeated batch invocations over
  * growing offset intervals.
  */
object Watermarks {

  def computeNewWatermark(inputs: Seq[TransformRequestInput]): Option[Instant] =
    inputs
      .flatMap(i => i.explicitWatermarks.map(_.eventTime).maxOption)
      .minOption

  /** A16: `[nextOffset, nextOffset + rows - 1]`, or None when 0 rows
    * (/root/reference/src/engine.rs:173-183). */
  def newOffsetInterval(nextOffset: Long, numRows: Long): Option[OffsetInterval] =
    if (numRows != 0) Some(OffsetInterval(nextOffset, nextOffset + numRows - 1))
    else None
}
