package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/**
 * Design-spike probe for ALTER TABLE ALTER COLUMN TYPE (type widening):
 * which read-time type promotions does Spark 4.1.2's parquet reader
 * support when the requested (logical) schema is WIDER than the type
 * written in the file footer?
 *
 * Delta Lake's `typeWidening` table feature relies exactly on this:
 * the widen commit only changes the logical schema; old footers keep
 * the narrow type and the scan upcasts per batch. If the vectorized
 * reader handles a promotion natively (SPARK-40876 family), the widen
 * is free; if only the non-vectorized path works, it is not viable on
 * the hot path; if neither works, the widen must be refused.
 *
 * For each (writtenType → requestedType) pair the probe checks:
 *   1. plain read correctness (values survive the upcast);
 *   2. filter correctness with a predicate typed at the WIDE type that
 *      selects rows near the narrow type's edge (this exercises
 *      parquet row-group pushdown against narrow footer stats — the
 *      spot where a naive implementation silently drops rows);
 *   3. that the vectorized reader was actually on (default conf).
 *
 * Run: sbt "runMain graft.tools.TypeWidenProbe"
 */
object TypeWidenProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("TypeWidenProbe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("widenprobe").toString

    // each case: (name, writer: path => Unit, widened schema, filter, expected count, expected sum as string)
    case class Case(name: String, write: String => Unit, wide: StructType,
                    pred: org.apache.spark.sql.Column, expectCount: Long)

    def p(n: String) = s"$base/$n"

    val cases = Seq(
      Case("byte->short",
        dir => Seq(1, 100, 127, -128).map(_.toByte).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", ShortType))), col("c") > lit(100.toShort), 1),
      Case("byte->int",
        dir => Seq(1, 100, 127, -128).map(_.toByte).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", IntegerType))), col("c") > lit(100), 1),
      Case("short->int",
        dir => Seq(1, 32767, -32768).map(_.toShort).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", IntegerType))), col("c") > lit(0), 2),
      Case("int->long",
        dir => Seq(1, Int.MaxValue, Int.MinValue).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", LongType))), col("c") > lit(0L), 2),
      Case("int->double",
        dir => Seq(1, Int.MaxValue, -7).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", DoubleType))), col("c") > lit(0.5), 2),
      Case("float->double",
        dir => Seq(1.5f, Float.MaxValue, -2.25f).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", DoubleType))), col("c") > lit(1.0), 2),
      Case("long->double",
        dir => Seq(1L, 1L << 54, -7L).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", DoubleType))), col("c") > lit(0.5), 2),
      Case("int->decimal(10,0)",
        dir => Seq(1, Int.MaxValue, -7).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", DecimalType(10, 0)))), col("c") > lit(0), 2),
      Case("decimal(5,2)->decimal(10,2)",
        dir => Seq("123.45", "-9.99").map(BigDecimal(_)).toDF("c")
          .select(col("c").cast(DecimalType(5, 2)).as("c")).write.parquet(dir),
        StructType(Seq(StructField("c", DecimalType(10, 2)))), col("c") > lit(0), 1),
      Case("date->timestamp_ntz",
        dir => Seq("2024-01-01", "2024-06-15").toDF("s")
          .select(col("s").cast(DateType).as("c")).write.parquet(dir),
        StructType(Seq(StructField("c", TimestampNTZType))),
        col("c") > lit("2024-03-01").cast(TimestampNTZType), 1),
      Case("byte->long",
        dir => Seq(1, 127).map(_.toByte).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", LongType))), col("c") > lit(1L), 1),
      Case("short->long",
        dir => Seq(1, 32767).map(_.toShort).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", LongType))), col("c") > lit(1L), 1),
      Case("short->double",
        dir => Seq(1, 32767).map(_.toShort).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", DoubleType))), col("c") > lit(1.0), 1),
      Case("long->decimal(20,0)",
        dir => Seq(1L, Long.MaxValue, -7L).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", DecimalType(20, 0)))), col("c") > lit(0), 2),
      Case("short->decimal(5,0)",
        dir => Seq(1, 32767).map(_.toShort).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", DecimalType(5, 0)))), col("c") > lit(1), 1),
      Case("byte->double",
        dir => Seq(1, 127).map(_.toByte).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", DoubleType))), col("c") > lit(1.0), 1),
      Case("short->decimal(10,0)",
        dir => Seq(1, 32767).map(_.toShort).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", DecimalType(10, 0)))), col("c") > lit(1), 1),
      Case("int->decimal(12,2)",
        dir => Seq(1, Int.MaxValue, -7).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", DecimalType(12, 2)))), col("c") > lit(0), 2),
      Case("long->decimal(22,2)",
        dir => Seq(1L, Long.MaxValue, -7L).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", DecimalType(22, 2)))), col("c") > lit(0), 2),
      Case("decimal(5,2)->decimal(38,10)",
        dir => Seq("123.45", "-9.99").map(BigDecimal(_)).toDF("c")
          .select(col("c").cast(DecimalType(5, 2)).as("c")).write.parquet(dir),
        StructType(Seq(StructField("c", DecimalType(38, 10)))), col("c") > lit(0), 1),
      Case("decimal(5,2)->decimal(9,2) (int32 target)",
        dir => Seq("123.45", "-9.99").map(BigDecimal(_)).toDF("c")
          .select(col("c").cast(DecimalType(5, 2)).as("c")).write.parquet(dir),
        StructType(Seq(StructField("c", DecimalType(9, 2)))), col("c") > lit(0), 1),
      Case("decimal(5,2)->decimal(9,3) (int32 rescale)",
        dir => Seq("123.45", "-9.99").map(BigDecimal(_)).toDF("c")
          .select(col("c").cast(DecimalType(5, 2)).as("c")).write.parquet(dir),
        StructType(Seq(StructField("c", DecimalType(9, 3)))), col("c") > lit(0), 1),
      Case("decimal(12,2)->decimal(14,4) (int64 rescale)",
        dir => Seq("123.45", "-9.99").map(BigDecimal(_)).toDF("c")
          .select(col("c").cast(DecimalType(12, 2)).as("c")).write.parquet(dir),
        StructType(Seq(StructField("c", DecimalType(14, 4)))), col("c") > lit(0), 1),
      Case("decimal(5,2)->decimal(12,5) (scale up)",
        dir => Seq("123.45", "-9.99").map(BigDecimal(_)).toDF("c")
          .select(col("c").cast(DecimalType(5, 2)).as("c")).write.parquet(dir),
        StructType(Seq(StructField("c", DecimalType(12, 5)))), col("c") > lit(0), 1),
      Case("date->timestamp (TZ, control)",
        dir => Seq("2024-01-01", "2024-06-15").toDF("s")
          .select(col("s").cast(DateType).as("c")).write.parquet(dir),
        StructType(Seq(StructField("c", TimestampType))),
        col("c") > lit("2024-03-01").cast(TimestampType), 1),
      Case("float->decimal(10,2) (control)",
        dir => Seq(1.5f, -2.25f).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", DecimalType(10, 2)))), col("c") > lit(0), 1),
      // control: a NARROWING request must fail or corrupt — record which
      Case("long->int (narrow, control)",
        dir => Seq(1L, 1L << 40).toDF("c").write.parquet(dir),
        StructType(Seq(StructField("c", IntegerType))), col("c") > lit(0), 2)
    )

    for (vec <- Seq(true, false)) {
      spark.conf.set("spark.sql.parquet.enableVectorizedReader", vec.toString)
      println(s"\n=== vectorized=$vec ===")
      cases.foreach { c =>
        val dir = p(c.name.replaceAll("[^a-zA-Z0-9]", "_") + (if (vec) "_v" else "_s"))
        c.write(dir)
        val res = try {
          val df = spark.read.schema(c.wide).parquet(dir)
          val all = df.collect()
          val filtered = df.filter(c.pred).collect()
          val fOk = filtered.length == c.expectCount
          s"read OK rows=${all.length} sample=${all.take(3).mkString(",")} " +
            s"filter=${filtered.length}/${c.expectCount} ${if (fOk) "OK" else "MISMATCH"}"
        } catch {
          case e: Throwable =>
            val root = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
              .toSeq.last
            s"FAIL ${root.getClass.getSimpleName}: ${Option(root.getMessage).getOrElse("").take(120)}"
        }
        println(f"${c.name}%-32s $res")
      }
    }
    spark.stop()
  }
}
