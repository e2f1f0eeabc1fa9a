package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** S9 (optional PNG scatter, `/root/reference/scripts/cluster.py:138-143`)
  * reduced to its engine-side essence: a bounded collect of (x, y, label)
  * triples for any external plotter. Plotting itself stays out of the
  * engine; the limit guard keeps the collect driver-safe.
  */
object Viz {
  def scatterData(df: DataFrame, xCol: String, yCol: String,
      labelCol: String, limit: Int = 10000): Array[(Double, Double, Int)] = {
    require(limit <= 100000, "scatterData is a plotting aid, not an export")
    df.select(col(xCol).cast("double"), col(yCol).cast("double"),
        col(labelCol).cast("int"))
      .limit(limit)
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getInt(2)))
  }
}
