package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** os process_ops (reference: src/carnot/funcs/os/process_ops.cc —
  * `shared_libraries(upid)` reads the target process's memory maps from
  * /proc on the collecting node). Executor-node /proc state is not
  * portable to a distributed engine: by the time a query runs, the row
  * may be processed on any executor, none of which host the original
  * process. The faithful Spark design is source-side enrichment (the
  * collector emits the library list as a column); this stub keeps the
  * signature so scripts parse, returning an empty JSON array.
  */
object ProcessOps {
  /** shared_libraries stub: always "[]" (see scaladoc for why). */
  def sharedLibraries(upid: Column): Column =
    when(upid.isNull, lit(null).cast("string")).otherwise(lit("[]"))
}
