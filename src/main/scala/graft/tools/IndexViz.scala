package graft.tools

import graft.core.model.{CubeId, Weight}
import graft.log.QbeastLog
import org.apache.spark.sql.SparkSession

/**
 * OTree index visualizer — the Spark-native counterpart of the
 * reference's `utils/visualizer` (qviz, a Flask/Dash app over
 * `_delta_log`: reference `utils/visualizer/qviz/qviz.py:16-40`,
 * `sampling_info.py`). Given a table path it prints the index tree and
 * sampling-efficiency stats to the terminal and writes ONE
 * self-contained HTML file (inline data + vanilla JS, no external
 * assets) with a collapsible cube tree and an interactive sampling-
 * fraction highlight — open it in any browser, no server needed.
 *
 *   sbt "runMain graft.tools.IndexViz <tablePath> [out.html]
 *        [--revision-id=1] [--fraction=0.02] [--max-cubes=10000]"
 *
 * Selection mirrors the read path exactly: a block is read at fraction f
 * iff `block.minWeight < Weight(f)` (`read/QbeastFileIndex.scala:120`),
 * so the reported "rows read / bytes read" are what a `.sample(f)` scan
 * of THIS revision would touch. Driver memory: this is a dev inspection
 * tool and replays the snapshot on the driver like `indexMetrics`;
 * `--max-cubes` caps the rendered tree (pre-order prefix) so the HTML
 * stays viewable for huge tables.
 */
object IndexViz {

  private[graft] case class CubeRow(
      id: String,
      parent: String,
      depth: Int,
      elementCount: Long,
      bytes: Double,
      minWeightValue: Int,
      maxWeightFraction: Double)

  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    require(positional.nonEmpty,
      "usage: IndexViz <tablePath> [out.html] [--revision-id=N] [--fraction=F] [--max-cubes=N]")
    val tablePath = positional(0)
    val outHtml = positional.lift(1).getOrElse("/tmp/qbeast_index_viz.html")
    def opt(name: String): Option[String] =
      args.collectFirst { case a if a.startsWith(s"--$name=") => a.drop(name.length + 3) }
    val fraction = opt("fraction").map(_.toDouble).getOrElse(0.02)
    val maxCubes = opt("max-cubes").map(_.toInt).getOrElse(10000)

    val preExisting = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val spark = preExisting.getOrElse {
      val s = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    try {
      val snap = QbeastLog.snapshot(tablePath, spark.sparkContext.hadoopConfiguration)
      require(snap.revisions.nonEmpty, s"no qbeast table at $tablePath")
      val revisionId = opt("revision-id").map(_.toLong)
        .getOrElse(snap.revisions.keys.filter(_ > 0L).maxOption.getOrElse(snap.lastRevisionID))
      val rows = cubeRows(snap, revisionId)
      printTree(rows, revisionId, fraction, maxLines = 200)
      val html = renderHtml(tablePath, revisionId, rows.take(maxCubes), rows.size, fraction)
      val p = new org.apache.hadoop.fs.Path(outHtml)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(p, true)
      try out.write(html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      println(s"[viz] wrote $outHtml (${rows.size} cubes, " +
        s"${math.min(rows.size, maxCubes)} rendered)")
    } finally if (preExisting.isEmpty) spark.stop()
  }

  /** Pre-order cube rows of `revisionId`: per-cube element counts, the
   * write-path maxWeight, the read-path block min weight, and bytes
   * apportioned from file sizes by each block's share of its file's
   * rows. */
  private[graft] def cubeRows(
      snap: graft.log.QbeastSnapshot,
      revisionId: Long): Vector[CubeRow] = {
    val status = snap.indexStatus(revisionId)
    val files = snap.files.filter(_.revisionId == revisionId)
    val minW = scala.collection.mutable.HashMap.empty[CubeId, Int]
    val bytes = scala.collection.mutable.HashMap.empty[CubeId, Double]
    files.foreach { f =>
      val fileRows = math.max(1L, f.elementCount)
      f.blocks.foreach { b =>
        minW.updateWith(b.cube) {
          case Some(w) => Some(math.min(w, b.minWeight.value))
          case None => Some(b.minWeight.value)
        }
        val share = f.size.toDouble * b.elementCount / fileRows
        bytes.updateWith(b.cube) {
          case Some(x) => Some(x + share)
          case None => Some(share)
        }
      }
    }
    status.cubeStatuses.iterator.map { case (cube, st) =>
      CubeRow(
        id = cube.toString,
        parent = cube.parent.map(_.toString).getOrElse(""),
        depth = cube.depth,
        elementCount = st.elementCount,
        bytes = bytes.getOrElse(cube, 0.0),
        minWeightValue = minW.getOrElse(cube, Weight.MinValue.value),
        maxWeightFraction = st.maxWeight.fraction)
    }.toVector
  }

  /** A block is read at fraction f iff minWeight < Weight(f) — the
   * read path's predicate (`QbeastFileIndex.scala:120`), applied at
   * cube granularity with the cube's min block weight. */
  private def selected(minWeightValue: Int, fraction: Double): Boolean = {
    val w = Weight.fromFraction(fraction)
    minWeightValue < w.value || w == Weight.MaxValue
  }

  private def printTree(
      rows: Vector[CubeRow],
      revisionId: Long,
      fraction: Double,
      maxLines: Int): Unit = {
    println(s"[viz] OTree index, revision $revisionId: ${rows.size} cubes, " +
      s"max depth ${rows.map(_.depth).maxOption.getOrElse(0)}")
    rows.take(maxLines).foreach { r =>
      val mark = if (selected(r.minWeightValue, fraction)) "*" else " "
      val label = if (r.id.isEmpty) "root" else r.id
      println(f"[viz] $mark ${"  " * r.depth}$label%-24s rows=${r.elementCount}%-9d " +
        f"maxW=${r.maxWeightFraction}%.4f bytes=${r.bytes / 1e6}%.2fMB")
    }
    if (rows.size > maxLines) println(s"[viz]   ... ${rows.size - maxLines} more cubes")
    val totRows = rows.map(_.elementCount).sum
    val totBytes = rows.map(_.bytes).sum
    val sel = rows.filter(r => selected(r.minWeightValue, fraction))
    val selRows = sel.map(_.elementCount).sum
    val selBytes = sel.map(_.bytes).sum
    println(f"[viz] sample fraction: $fraction")
    println(f"[viz] rows read:  $selRows/$totRows (${pct(selRows, totRows)}%.2f%%)")
    println(f"[viz] bytes read: ${selBytes / 1e9}%.5f/${totBytes / 1e9}%.5fGB " +
      f"(${if (totBytes == 0) 0.0 else selBytes * 100.0 / totBytes}%.2f%%)")
  }

  private def pct(a: Long, b: Long): Double = if (b == 0) 0.0 else a * 100.0 / b

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def renderHtml(
      tablePath: String,
      revisionId: Long,
      rows: Vector[CubeRow],
      totalCubes: Int,
      fraction: Double): String = {
    val data = rows.map { r =>
      s"""{"id":${jsonStr(r.id)},"parent":${jsonStr(r.parent)},"depth":${r.depth},""" +
        s""""rows":${r.elementCount},"bytes":${r.bytes.toLong},""" +
        s""""minw":${r.minWeightValue},"maxwf":${r.maxWeightFraction}}"""
    }.mkString("[", ",", "]")
    // Weight.fromFraction in JS: value = round(MinValue + f*(span))
    val minV = Weight.MinValue.value
    val maxV = Weight.MaxValue.value
    s"""<!doctype html>
<html><head><meta charset="utf-8"><title>qbeast index — $tablePath</title>
<style>
 body{font:13px monospace;margin:16px;background:#fafafa;color:#222}
 details{margin-left:18px;border-left:1px dotted #bbb;padding-left:6px}
 summary{cursor:pointer;padding:1px 3px;border-radius:3px}
 summary.sel{background:#cdeccd}
 .bar{display:inline-block;height:8px;background:#7aa7d6;vertical-align:middle;margin-left:6px}
 #info{margin:10px 0;padding:8px;background:#fff;border:1px solid #ddd;max-width:48em}
</style></head><body>
<h3>OTree index — ${tablePath} (revision $revisionId)</h3>
<p>$totalCubes cubes${if (rows.size < totalCubes) s", first ${rows.size} rendered" else ""}.
 Sampling fraction <input id="f" type="number" step="0.01" min="0" max="1" value="$fraction">
 — selected cubes (what <code>.sample(f)</code> would read) highlighted.</p>
<div id="info"></div><div id="tree"></div>
<script>
const DATA=$data, MINV=$minV, MAXV=$maxV;
const byParent={};
DATA.forEach(c=>{(byParent[c.parent]=byParent[c.parent]||[]).push(c);});
const maxRows=Math.max(1,...DATA.map(c=>c.rows));
function wOf(f){ if(f>=1) return MAXV; return Math.round(MINV+f*(MAXV-MINV)); }
function sel(c,f){ const w=wOf(f); return c.minw<w || w===MAXV; }
function fmt(n){ return n.toLocaleString('en-US'); }
function node(c,f){
  const d=document.createElement('details'); d.open=c.depth<2;
  const s=document.createElement('summary');
  if(sel(c,f)) s.className='sel';
  const label=c.id===''?'root':c.id;
  s.textContent=label+'  rows='+fmt(c.rows)+'  maxW='+c.maxwf.toFixed(4)+'  '+(c.bytes/1e6).toFixed(2)+'MB';
  const bar=document.createElement('span'); bar.className='bar';
  bar.style.width=Math.max(1,60*c.rows/maxRows)+'px'; s.appendChild(bar);
  d.appendChild(s);
  (byParent[c.id]||[]).forEach(ch=>d.appendChild(node(ch,f)));
  return d;
}
function render(){
  const f=parseFloat(document.getElementById('f').value)||0;
  const tree=document.getElementById('tree'); tree.innerHTML='';
  (byParent['']||[]).filter(c=>c.depth===0).forEach(r=>tree.appendChild(node(r,f)));
  // the root's parent is '' and depth 0; nested cubes attach by parent id
  const tot=DATA.reduce((a,c)=>a+c.rows,0), totB=DATA.reduce((a,c)=>a+c.bytes,0);
  const s=DATA.filter(c=>sel(c,f));
  const sr=s.reduce((a,c)=>a+c.rows,0), sb=s.reduce((a,c)=>a+c.bytes,0);
  document.getElementById('info').textContent=
    'sample fraction '+f+': rows read '+fmt(sr)+'/'+fmt(tot)+' ('+(tot?(100*sr/tot).toFixed(2):0)+'%), '+
    'bytes read '+(sb/1e9).toFixed(5)+'/'+(totB/1e9).toFixed(5)+'GB ('+(totB?(100*sb/totB).toFixed(2):0)+'%), '+
    'cubes '+s.length+'/'+DATA.length;
}
document.getElementById('f').addEventListener('input',render);
render();
</script></body></html>
"""
  }
}
