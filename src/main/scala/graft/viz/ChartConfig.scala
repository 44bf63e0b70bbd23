package graft.viz

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/**
 * Chart-config derivation — the engine's side of the reference's
 * visualization layer (SURVEY §2.9): given a result schema, propose and
 * validate `{type, xAxis, yAxis, zAxis?}`. Rendering is out of scope.
 *
 * Chart types: Recharts bar/line/area/scatter
 * (reference: ui/src/DynamicChart.tsx:42-72), D3 d3-scatter/d3-line/d3-bar
 * (ui/src/EnhancedVisualizations.tsx:78-112), Plotly 3d-scatter/3d-surface
 * (ui/src/EnhancedVisualizations.tsx:119-238), plus "none".
 */
final case class ChartConfig(
    chartType: String,
    xAxis: String,
    yAxis: String,
    zAxis: Option[String] = None)

object ChartConfig {

  val chartTypes: Set[String] = Set(
    "bar", "line", "area", "scatter",
    "d3-scatter", "d3-line", "d3-bar",
    "3d-scatter", "3d-surface", "none")

  /**
   * Numeric-column detection. The reference sniffs the first row
   * (`typeof sample === 'number' || !isNaN(parseFloat(sample))`,
   * ui/src/VisualizationPresets.tsx:17-24); with a real schema we use the
   * type directly — plus the reference's quirk that numeric-looking
   * strings count, which we reproduce only when a sample row is supplied.
   */
  def numericColumns(df: DataFrame, sample: Option[org.apache.spark.sql.Row] = None): Seq[String] =
    df.schema.fields.toSeq.filter { f =>
      f.dataType.isInstanceOf[NumericType] || (sample match {
        case Some(row) =>
          val i = df.schema.fieldIndex(f.name)
          !row.isNullAt(i) && scala.util.Try(
            java.lang.Double.parseDouble(String.valueOf(row.get(i)))).isSuccess
        case None => false
      })
    }.map(_.name)

  /** Auto-select axes like the preset panel (VisualizationPresets.tsx:28-39):
    * x = first column, y = first numeric, z = second numeric. */
  def suggest(df: DataFrame, chartType: String = "bar"): Option[ChartConfig] = {
    val all = df.columns.toSeq
    val numeric = numericColumns(df)
    for {
      x <- all.headOption
      y <- numeric.headOption
    } yield ChartConfig(chartType, x, y,
      if (chartType.startsWith("3d")) numeric.drop(1).headOption else None)
  }

  /** Validate a config against the result schema — the reference checks
    * axis columns exist in the first row (ui/src/App.tsx:1743-1777). */
  def validate(df: DataFrame, config: ChartConfig): Either[String, ChartConfig] = {
    val cols = df.columns.toSet
    if (!chartTypes.contains(config.chartType))
      Left(s"Unknown chart type: ${config.chartType}")
    else if (!cols.contains(config.xAxis))
      Left(s"""Column "${config.xAxis}" not found in data""")
    else if (!cols.contains(config.yAxis))
      Left(s"""Column "${config.yAxis}" not found in data""")
    else config.zAxis.filterNot(cols.contains) match {
      case Some(z) => Left(s"""Column "$z" not found in data""")
      case None    => Right(config)
    }
  }
}
