package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Differential spec: the codegen'd [[org.apache.spark.sql.graft.VecQuant8]]
  * path of [[Quantize.int8]] must be bit-identical to the declarative HOF
  * formulation it replaced ([[Quantize.int8Hof]]) — including the edge
  * cases: null vectors, null elements (null codes — writing this spec
  * caught the HOF's `greatest(null, -127)` null-skipping mapping missing
  * components to −127), empty vectors, all-zero vectors (scale 0, every
  * non-null element → 0), and values that clamp at ±127.
  */
class QuantizeSpec extends SparkSuite {

  private def vecDf(rows: Seq[Seq[java.lang.Float]]) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true), nullable = true)))
    val data = rows.zipWithIndex.map { case (v, i) =>
      Row(i.toLong, if (v == null) null else v)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), schema)
  }

  private def collectQ(df: org.apache.spark.sql.DataFrame): Map[Long, (Option[Double], Option[Seq[Option[Byte]]])] =
    df.select(col("vec_id"), col("scale"), col("q8")).collect().map { r =>
      val scale = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      val q = if (r.isNullAt(2)) None
        else Some(r.getSeq[Any](2).map(x => Option(x).map(_.asInstanceOf[Byte])))
      r.getLong(0) -> (scale, q)
    }.toMap

  test("codegen'd int8 quantization is bit-identical to the HOF formulation") {
    val f = (x: Float) => java.lang.Float.valueOf(x)
    val edge: Seq[Seq[java.lang.Float]] = Seq(
      Seq(f(1.0f), f(-2.5f), f(0.31f)),
      Seq(f(0.0f), f(0.0f)),                    // scale 0 → all codes 0
      Seq.empty,                                // empty vector
      null,                                     // null vector
      Seq(f(3.0f), null, f(-3.0f)),             // null element, nonzero scale
      Seq(null, f(0.0f)),                       // null element, scale 0
      Seq(f(1e-30f), f(1e30f)),                 // clamp + tiny ratios
      Seq(f(-127.0f), f(127.0f), f(1.0f)),
      Seq(f(0.5f), f(-0.5f), f(0.25f)))         // rounding ties
    val rnd = new scala.util.Random(42)
    val fuzz: Seq[Seq[java.lang.Float]] = Seq.fill(200) {
      Seq.fill(1 + rnd.nextInt(8))(
        if (rnd.nextInt(20) == 0) null
        else f((rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)).toFloat))
    }
    val df = vecDf(edge ++ fuzz)
    val fast = collectQ(Quantize.int8(df, "embedding"))
    val slow = collectQ(Quantize.int8Hof(df, "embedding"))
    assert(fast.keySet == slow.keySet)
    for (k <- fast.keySet) assert(fast(k) == slow(k), s"vec_id=$k")
  }

  test("quantized codes round-trip within scale/2 per component") {
    val rnd = new scala.util.Random(7)
    val df = vecDf(Seq.fill(50)(Seq.fill(16)(
      java.lang.Float.valueOf(rnd.nextGaussian().toFloat))))
    val rows = Quantize.int8(df, "embedding")
      .select(col("embedding"), col("scale"), col("q8")).collect()
    for (r <- rows) {
      val emb = r.getSeq[Float](0); val scale = r.getDouble(1)
      val q = r.getSeq[Byte](2)
      for (i <- emb.indices) {
        val err = math.abs(q(i) * scale - emb(i))
        // clamped components can exceed scale/2; none here (maxAbs/scale = 127)
        assert(err <= scale / 2 + 1e-12, s"component $i err $err scale $scale")
      }
    }
  }
}
