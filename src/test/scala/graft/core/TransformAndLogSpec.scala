package graft.core

import graft.core.model._
import graft.core.transform._
import graft.index.ColumnIndexer
import graft.log._
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The pruning-correctness invariant: the write-side Column expression
 * and the read-side literal transform must agree numerically, otherwise
 * file pruning could disagree with row values. */
class TransformParitySpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("linear transformation: Column expr matches literal transform") {
    import spark.implicits._
    val t = LinearTransformer("v", "double")
    val tr = LinearTransformation(10.0, 110.0, 0.42)
    val values = Seq(10.0, 35.5, 110.0, 55.123, 109.999)
    val df = values.toDF("v")
    val got = df.select(ColumnIndexer.coordinateColumn(t, tr)).collect().map(_.getDouble(0))
    val expected = values.map(v => tr.transform(v))
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g != $e") }
  }

  test("hash transformation: Column expr matches literal transform on strings") {
    import spark.implicits._
    val t = HashTransformer("s", "string")
    val tr = HashTransformation("string")
    val values = Seq("BUILDING", "AUTOMOBILE", "", "qbeast", "ünïcødé 的")
    val df = values.toDF("s")
    val got = df.select(ColumnIndexer.coordinateColumn(t, tr)).collect().map(_.getDouble(0))
    val expected = values.map(tr.transform)
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g != $e") }
  }

  test("timestamp canonical form matches catalyst literal micros") {
    import spark.implicits._
    val t = LinearTransformer("ts", "timestamp")
    val ts = java.sql.Timestamp.valueOf("2020-06-01 12:34:56.789")
    val micros = ts.getTime * 1000L
    val tr = LinearTransformation(0.0, 2.0 * micros, 0.5)
    val df = Seq(ts).toDF("ts")
    val got = df.select(ColumnIndexer.coordinateColumn(t, tr)).head.getDouble(0)
    // read side sees catalyst micros (Long)
    assert(got == tr.transform(micros))
  }

  test("cdf quantiles: monotonic ranks, exact hits, out-of-range clamps") {
    val tr = CDFNumericQuantilesTransformation(Vector(0.0, 10.0, 20.0, 40.0, 100.0))
    assert(tr.transform(0.0) == 0.0)
    assert(tr.transform(100.0) == 1.0)
    assert(tr.transform(20.0) == 0.5)
    assert(tr.transform(-5.0) == 0.0)
    assert(tr.transform(500.0) == 1.0)
    assert(tr.transform(15.0) > tr.transform(5.0))
    val st = CDFStringQuantilesTransformation(Vector("a", "g", "p", "z"))
    assert(st.transform("a") == 0.0 && st.transform("z") == 1.0)
    assert(st.transform("g") == 1.0 / 3)
    assert(st.transform("h") > st.transform("b"))
  }

  test("string histogram: reference bin semantics incl. null and serde") {
    // reference StringHistogramTransformation.transform: exact hit
    // i/(n-1); miss → bin LEFT of the insertion point; edges clamp
    val tr = StringHistogramTransformation(Vector("b", "g", "p", "x"))
    assert(tr.transform("b") == 0.0)
    assert(tr.transform("g") == 1.0 / 3)
    assert(tr.transform("x") == 1.0)
    assert(tr.transform("a") == 0.0) // below range
    assert(tr.transform("z") == 1.0) // above range
    assert(tr.transform("h") == 1.0 / 3) // falls in bin [g, p)
    assert(tr.transform("c") == 0.0) // falls in bin [b, g)
    assert(tr.transform(null) == tr.transform("null")) // reference null handling
    // default histogram yields to custom, custom never falls back
    val dflt = StringHistogramTransformation(
      StringHistogramTransformation.DefaultHistogram)
    assert(dflt.isSupersededBy(tr))
    assert(!tr.isSupersededBy(dflt))
    // revision with a histogram transformation round-trips the log serde
    val rev = Revision(1L, 0L, "t", 1000,
      Vector(StringHistogramTransformer("s", "string")), Vector(tr))
    val back = QbeastLogSerde.revisionFromJson(
      org.json4s.jackson.JsonMethods.parse(
        org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(QbeastLogSerde.revisionToJson(rev)))))
    assert(back.transformations.head == tr)
    assert(back.columnTransformers.head == StringHistogramTransformer("s", "string"))
    // write-side Column expr agrees with the literal transform
    import spark.implicits._
    val vals = Seq("a", "b", "c", "g", "h", "p", "q", "x", "z")
    val df = vals.toDF("s")
    val got = df.select(ColumnIndexer.coordinateColumn(
      StringHistogramTransformer("s", "string"), tr).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == vals.map(tr.transform))
  }

  test("supersede/merge semantics drive revision changes") {
    val lin = LinearTransformation(0, 100, 0.5)
    assert(!lin.isSupersededBy(LinearTransformation(10, 90, 0.5)))
    assert(lin.isSupersededBy(LinearTransformation(-1, 90, 0.5)))
    assert(lin.merge(LinearTransformation(-1, 190, 0.5)) ==
      LinearTransformation(-1, 190, 0.5))
    assert(!HashTransformation("string").isSupersededBy(HashTransformation("string")))
    assert(EmptyTransformation.isSupersededBy(lin))
    assert(IdentityTransformation(Some(5.0)).isSupersededBy(lin))
    assert(IdentityTransformation(Some(1.0)).merge(IdentityTransformation(Some(3.0))) ==
      LinearTransformation(1.0, 3.0, 2.0))
  }
}

class LogSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  private def conf = spark.sparkContext.hadoopConfiguration

  private def sampleRevision(id: Long) = Revision(
    id, 123456789L, "/tmp/t", 5000,
    Vector(LinearTransformer("a", "bigint"), HashTransformer("b", "string")),
    Vector(LinearTransformation(0, 100, 0.3), HashTransformation("string")))

  test("actions round-trip through JSON") {
    val rev = sampleRevision(1)
    val file = IndexFile("abc.parquet", 1000L, 77L, 1L,
      Vector(Block(CubeId.root(2).child(1), Weight(-5), Weight(10), 42L)), Some("{}"))
    val dims: Long => Int = _ => 2
    val lines = Seq(
      MetaDataAction("""{"type":"struct","fields":[]}""", Map("k" -> "v")),
      RevisionAction(rev), AddFileAction(file, dataChange = true),
      RemoveFileAction(RemoveFile("x.parquet", 9L)), TxnAction("app", 3L))
    lines.foreach { a =>
      val parsed = QbeastLogSerde.parseLine(QbeastLogSerde.actionToJsonLine(a), dims)
      assert(parsed == a, s"round trip failed for $a")
    }
  }

  test("snapshot replay: adds, removes, revisions, txns, conflict detection") {
    val dir = graft.TestSpark.tmpDir("qlog")
    val rev = sampleRevision(1)
    val f1 = IndexFile("f1.parquet", 10, 1, 1, Vector(Block(CubeId.root(2), Weight(0), Weight(5), 7)))
    val f2 = IndexFile("f2.parquet", 20, 2, 1, Vector(Block(CubeId.root(2), Weight(0), Weight(5), 9)))
    val v0 = QbeastLog.commit(dir, conf, -1,
      Seq(MetaDataAction("""{"type":"struct","fields":[]}""", Map("qbeast.lastRevisionID" -> "1")),
        RevisionAction(rev), AddFileAction(f1, true), TxnAction("app", 1)))
    assert(v0 == 0)
    val v1 = QbeastLog.commit(dir, conf, 0,
      Seq(AddFileAction(f2, true), RemoveFileAction(RemoveFile("f1.parquet", 5))))
    assert(v1 == 1)
    val snap = QbeastLog.snapshot(dir, conf)
    assert(snap.version == 1)
    assert(snap.files.map(_.path) == Vector("f2.parquet"))
    assert(snap.revisions(1L).columnNames == Vector("a", "b"))
    assert(snap.txns("app") == 1)
    // losing writer: version 1 already taken
    intercept[ConcurrentCommitException] {
      QbeastLog.commit(dir, conf, 0, Seq(AddFileAction(f1, true)))
    }
  }
}
