package graft.tools

/**
 * Design-spike probe for ALTER TABLE RENAME COLUMN (round-15 worklist
 * item): IF rename were implemented as "rewrite the name key inside
 * each AddFile's stats JSON at checkpoint time", what does the
 * mechanical rewrite cost at sidecar scale?
 *
 * Measures, over N synthetic per-file stats JSONs (the shape
 * QbeastWriter emits: numRecords + min/max/nullCount for 3 columns +
 * a bloom section):
 *   1. parse + key-rename + re-serialize throughput (the driver-side
 *      or per-partition work a checkpoint rewrite would add), via the
 *      same jackson mapper the reader uses;
 *   2. a regex-free string-level key swap (the cheap path if the
 *      rewrite were done textually), for comparison.
 *
 * The checkpoint-write half of the cost is already measured: r14's
 * 1e6-file probes put a full sidecar rewrite at ~13 s vs 0.45 s
 * incremental (NOTES_r14). This probe answers whether the added
 * per-file JSON work moves that number.
 *
 * NOTE (see NOTES_r15 design note): the spike's conclusion is that a
 * stats rewrite ALONE cannot deliver rename — data files keep the old
 * PHYSICAL column name, and Spark's by-name parquet resolution would
 * read the renamed column as all-null. A real rename needs a
 * logical→physical name mapping applied at every scan (Delta column
 * mapping, name mode). The probe bounds the metadata half only.
 *
 * Run: sbt "runMain graft.tools.RenameProbe [numFiles]"
 */
object RenameProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1000000

    def statsJson(f: Int): String = {
      val base = f.toLong * 200
      s"""{"numRecords":200,"minValues":{"a":$base,"v":$base.0,"s":"w$f"},""" +
        s""""maxValues":{"a":${base + 199},"v":${base + 199}.0,"s":"w${f}z"},""" +
        s""""nullCount":{"a":0,"v":2,"s":1},"bloom":{"s":"AAAA${f % 97}"}}"""
    }
    val stats = Array.tabulate(n)(statsJson)
    val bytes = stats.iterator.map(_.length.toLong).sum
    println(f"[rename] fixture: $n%d stats JSONs, ${bytes / 1e6}%.0f MB")

    // 1. structured rewrite: parse → rename "a"→"b" in every section →
    //    serialize (jackson, same as the stats reader)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var t0 = System.nanoTime()
    var outBytes = 0L
    var i = 0
    while (i < n) {
      val node = mapper.readTree(stats(i))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      Seq("minValues", "maxValues", "nullCount", "bloom").foreach { sec =>
        node.get(sec) match {
          case o: com.fasterxml.jackson.databind.node.ObjectNode if o.has("a") =>
            val v = o.remove("a")
            o.set("b", v)
            ()
          case _ =>
        }
      }
      outBytes += mapper.writeValueAsString(node).length
      i += 1
    }
    val structured = (System.nanoTime() - t0) / 1e9
    println(f"[rename] structured parse+rename+serialize: $structured%.2f s " +
      f"(${n / structured / 1e6}%.2f M files/s, single thread)")

    // 2. textual key swap ("\"a\":" → "\"b\":") — only safe because the
    //    writer never emits a column name as a VALUE prefix; kept for
    //    the cost floor, not proposed as the implementation
    t0 = System.nanoTime()
    var outBytes2 = 0L
    i = 0
    while (i < n) {
      outBytes2 += stats(i).replace("\"a\":", "\"b\":").length
      i += 1
    }
    val textual = (System.nanoTime() - t0) / 1e9
    println(f"[rename] textual key swap: $textual%.2f s " +
      f"(${n / textual / 1e6}%.2f M files/s, single thread)")
    println(f"[rename] r14 reference: full sidecar rewrite ~13 s at 1e6 files; " +
      f"structured rewrite adds ~${structured}%.1f s single-threaded " +
      f"(parallelizes across checkpoint partitions)")
    if (outBytes == 0 || outBytes2 == 0) println("unreachable") // keep JIT honest
  }
}
