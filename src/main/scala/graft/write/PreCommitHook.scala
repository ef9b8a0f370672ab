package graft.write

import graft.core.model.IndexFile

import org.apache.spark.sql.SparkSession

/**
 * Pre-commit hooks (reference: `core/.../model/PreCommitHook.scala` +
 * wiring in `DeltaMetadataWriter.scala:107-160`): user classes run over
 * the files about to be committed; their output lands in the commit's
 * metadata configuration as tags.
 *
 * Configure with write options:
 *   `hook.<name>=com.example.MyHook` and optional
 *   `hookArg.<name>=<arg>` (passed to a 1-String-arg constructor).
 */
trait PreCommitHook {
  def name: String
  def run(spark: SparkSession, files: Seq[IndexFile]): Map[String, String]
}

object PreCommitHook {

  val HookOptionPrefix = "hook."
  val HookArgOptionPrefix = "hookArg."

  /** Instantiate the hooks declared in write options via reflection. */
  def loadHooks(options: Map[String, String]): Seq[PreCommitHook] =
    options.collect {
      case (k, className) if k.toLowerCase.startsWith(HookOptionPrefix) &&
          !k.toLowerCase.startsWith(HookArgOptionPrefix.toLowerCase) =>
        val hookName = k.substring(HookOptionPrefix.length)
        val arg = options.collectFirst {
          case (ak, av) if ak.equalsIgnoreCase(s"$HookArgOptionPrefix$hookName") => av
        }
        val cls = Class.forName(className)
        arg match {
          case Some(a) =>
            cls.getConstructor(classOf[String]).newInstance(a).asInstanceOf[PreCommitHook]
          case None =>
            cls.getDeclaredConstructor().newInstance().asInstanceOf[PreCommitHook]
        }
    }.toSeq

  def runHooks(
      hooks: Seq[PreCommitHook],
      spark: SparkSession,
      files: Seq[IndexFile]): Map[String, String] =
    hooks.flatMap { h =>
      h.run(spark, files).map { case (k, v) => s"qbeast.hook.${h.name}.$k" -> v }
    }.toMap

}
