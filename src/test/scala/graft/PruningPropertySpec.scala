package graft

import graft.read.FileStatsPruning
import graft.write.FileStatsCollector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression => CExpr, _}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property test for the stats machinery the metadata-count rewrite and
 * file pruning stand on: for randomized files (nulls, NaN, ±Infinity,
 * boundary duplicates) and randomized predicates, the tri-state proof
 * and the may-match pruning verdicts must agree with SPARK'S OWN
 * evaluation of the same predicate over the same rows:
 *
 *   - proveAll == Some(true)   ⟹  every row matches
 *   - proveAll == Some(false)  ⟹  no row matches
 *   - mayMatch == false        ⟹  no row matches (pruning is safe)
 *
 * A wrong Some(true)/Some(false) is a WRONG QUERY ANSWER (the filtered
 * count folds from it); a wrong mayMatch=false silently drops rows.
 */
class PruningPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("l", LongType),
    StructField("d", DoubleType),
    StructField("s", StringType),
    StructField("b", BooleanType)))

  private def randomRows(rnd: scala.util.Random, n: Int): Seq[(Any, Any, Any, Any)] = {
    def longV: Any = rnd.nextInt(5) match {
      case 0 => null
      case _ => (rnd.nextInt(21) - 10).toLong
    }
    def dblV: Any = rnd.nextInt(10) match {
      case 0 => null
      case 1 => Double.NaN
      case 2 => Double.PositiveInfinity
      case 3 => Double.NegativeInfinity
      case _ => (rnd.nextInt(21) - 10) * 0.5
    }
    def strV: Any = rnd.nextInt(5) match {
      case 0 => null
      case _ => s"v${rnd.nextInt(8)}"
    }
    def boolV: Any = rnd.nextInt(5) match {
      case 0 => null
      case _ => rnd.nextBoolean()
    }
    Seq.fill(n)((longV, dblV, strV, boolV))
  }

  /** (catalyst expression for proveAll/mayMatch, Column for Spark). */
  private def randomPredicate(rnd: scala.util.Random): (CExpr, Column) = {
    def attr(name: String, dt: DataType) = AttributeReference(name, dt)()
    def atom(): (CExpr, Column) = rnd.nextInt(10) match {
      case 0 => (IsNull(attr("d", DoubleType)), col("d").isNull)
      case 1 => (IsNotNull(attr("l", LongType)), col("l").isNotNull)
      case 2 =>
        val v = (rnd.nextInt(25) - 12).toLong
        (GreaterThan(attr("l", LongType), Literal(v)), col("l") > v)
      case 3 =>
        val v = rnd.nextInt(6) match {
          case 0 => Double.NaN
          case 1 => Double.PositiveInfinity
          case 2 => Double.NegativeInfinity
          case _ => (rnd.nextInt(25) - 12) * 0.5
        }
        rnd.nextInt(3) match {
          case 0 => (GreaterThanOrEqual(attr("d", DoubleType), Literal(v)), col("d") >= v)
          case 1 => (LessThan(attr("d", DoubleType), Literal(v)), col("d") < v)
          case _ => (EqualTo(attr("d", DoubleType), Literal(v)), col("d") === v)
        }
      case 4 =>
        val v = s"v${rnd.nextInt(10)}"
        rnd.nextInt(2) match {
          case 0 => (EqualTo(attr("s", StringType), Literal(v)), col("s") === v)
          case _ => (LessThanOrEqual(attr("s", StringType), Literal(v)), col("s") <= v)
        }
      case 5 =>
        val v = rnd.nextBoolean()
        (EqualTo(attr("b", BooleanType), Literal(v)), col("b") === v)
      case 6 =>
        val vs = Seq.fill(1 + rnd.nextInt(3))((rnd.nextInt(25) - 12).toLong)
        (In(attr("l", LongType), vs.map(Literal(_))), col("l").isin(vs: _*))
      case 7 =>
        val v = (rnd.nextInt(25) - 12).toLong
        (LessThanOrEqual(attr("l", LongType), Literal(v)), col("l") <= v)
      case 8 =>
        val v = (rnd.nextInt(25) - 12) * 0.5
        (GreaterThan(attr("d", DoubleType), Literal(v)), col("d") > v)
      case _ =>
        val v = (rnd.nextInt(25) - 12).toLong
        (EqualTo(attr("l", LongType), Literal(v)), col("l") === v)
    }
    val k = 1 + rnd.nextInt(3)
    val atoms = Seq.fill(k)(atom())
    atoms.reduce { (a, b) =>
      if (rnd.nextBoolean()) (And(a._1, b._1), a._2 && b._2)
      else (Or(a._1, b._1), a._2 || b._2)
    }
  }

  test("proveAll and mayMatch agree with Spark's evaluation on random files/predicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    var proofsTrue = 0
    var proofsFalse = 0
    var pruned = 0
    (1 to 120).foreach { trial =>
      val rows = randomRows(rnd, 1 + rnd.nextInt(12))
      val df: DataFrame = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (l, d, s, b) =>
          org.apache.spark.sql.Row(l, d, s, b)
        }, 1), schema)

      // stats exactly as the writer collects them (copy each row:
      // toRdd's iterator reuses one UnsafeRow buffer, so an uncopied
      // collect() yields N references to the LAST row)
      val collector = new FileStatsCollector(schema)
      df.queryExecution.toRdd.map(_.copy()).collect().foreach(collector.update)
      val stats = FileStatsPruning.parse(collector.toJson).getOrElse(
        fail(s"trial $trial: unparseable stats ${collector.toJson}"))

      (1 to 8).foreach { _ =>
        val (expr, column) = randomPredicate(rnd)
        val matched = df.filter(column).count()
        val total = rows.length.toLong

        FileStatsPruning.proveAll(stats, expr) match {
          case Some(true) =>
            proofsTrue += 1
            assert(matched == total,
              s"trial $trial: proveAll TRUE but $matched/$total match " +
                s"pred=$expr stats=${collector.toJson} rows=$rows")
          case Some(false) =>
            proofsFalse += 1
            assert(matched == 0L,
              s"trial $trial: proveAll FALSE but $matched match " +
                s"pred=$expr stats=${collector.toJson} rows=$rows")
          case None =>
        }
        if (!FileStatsPruning.mayMatch(Some(collector.toJson), Seq(expr))) {
          pruned += 1
          assert(matched == 0L,
            s"trial $trial: pruned but $matched rows match " +
              s"pred=$expr stats=${collector.toJson} rows=$rows")
        }
      }
    }
    // the proofs must actually FIRE on this distribution, or the test
    // is vacuously green
    assert(proofsTrue > 20, s"only $proofsTrue all-match proofs fired")
    assert(proofsFalse > 50, s"only $proofsFalse none-match proofs fired")
    assert(pruned > 50, s"only $pruned prune verdicts fired")
  }

}
