package graft.functions

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** os process_ops (reference: src/carnot/funcs/os/process_ops.cc;
  * filesystem.h:35-50 GetSharedLibraries): `shared_libraries(upid)`
  * lists the file-backed memory mappings of the target process by
  * reading the /proc/<pid>/map_files symlinks on the node hosting the
  * process. The reference pins this UDF to the collecting agent
  * (UDF_PEM executor placement); the Spark analog executes the read on
  * whichever executor processes the row — the same host in node-local
  * deployments and always in local mode. For a pid not visible on the
  * executing node the read returns "" — the reference's own contract
  * when the /proc path does not exist — so a multi-node deployment
  * degrades gracefully per-row instead of failing; full remote fidelity
  * is source-side enrichment (a collector concern, not a query-engine
  * one).
  */
object ProcessOps {

  private def jsonEscape(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** GetSharedLibraries semantics (filesystem.h:35-50 + shared/utils.h
    * StringifyVector): "" when map_files is absent/unreadable/empty;
    * the bare path when exactly one mapping; a JSON array otherwise.
    * One entry PER MAPPING (a library mapped in several regions repeats,
    * as in the reference); ordered by map_files entry name (the mapping
    * address range) where the reference inherits directory order —
    * deterministic on any one node.
    */
  def readSharedLibraries(pid: Long): String =
    try {
      val dir = Paths.get(s"/proc/$pid/map_files")
      if (!Files.isDirectory(dir)) ""
      else {
        val stream = Files.list(dir)
        val libs =
          try stream.iterator().asScala.toVector
            .sortBy(_.getFileName.toString)
            .flatMap { p =>
              try {
                if (Files.isSymbolicLink(p))
                  Some(Files.readSymbolicLink(p).toString)
                else None
              } catch { case _: Exception => None }
            }
          finally stream.close()
        if (libs.isEmpty) ""
        else if (libs.size == 1) libs.head
        else libs.map(s => "\"" + jsonEscape(s) + "\"")
          .mkString("[", ",", "]")
      }
    } catch { case _: Exception => "" }

  private val sharedLibsUdf = udf((pid: java.lang.Long) =>
    if (pid == null) null else readSharedLibraries(pid.longValue()))

  /** px.shared_libraries(upid): the pid is bytes 4-7 of the 16-byte
    * upid (types/Upid.scala byte-order contract). A UDF by necessity —
    * the value is an executor-local OS read, exactly like the
    * reference's ScalarUDF; everything around it stays codegen'd.
    */
  def sharedLibraries(upid: Column): Column =
    sharedLibsUdf(conv(hex(substring(upid, 5, 4)), 16, 10).cast("long"))
}
