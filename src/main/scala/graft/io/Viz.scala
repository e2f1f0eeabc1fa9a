package graft.io

import java.awt.{BasicStroke, Color, RenderingHints}
import java.awt.image.BufferedImage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** S9 — PNG scatter of the two clustering columns colored by prediction
  * (`/root/reference/scripts/cluster.py:138-143`). The reference shells
  * out to matplotlib; here the rendering is JDK-native (`java.awt`
  * Graphics2D raster + `javax.imageio` PNG writer — no external plotting
  * dependency), so the sink produces an actual image, not just plot data.
  *
  * [[scatterData]] remains the engine-side contract: a BOUNDED collect of
  * (x, y, label) triples — the plot is a driver-side finishing step over
  * at most `limit` points, never a data-scale operation.
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

  /** Category palette (tab10-style hues); label colors are `label % 10`. */
  val Palette: Array[Int] = Array(
    0x1f77b4, 0xff7f0e, 0x2ca02c, 0xd62728, 0x9467bd,
    0x8c564b, 0xe377c2, 0x7f7f7f, 0xbcbd22, 0x17becf)

  private val Margin = 42
  private val Pad = 12

  /** Pixel position of a data point inside a width×height canvas — exposed
    * for the rendering spec, which asserts drawn pixels land where the
    * mapping says. Degenerate spans center the points. */
  def pixelOf(x: Double, y: Double, xMin: Double, xMax: Double,
      yMin: Double, yMax: Double, width: Int, height: Int): (Int, Int) = {
    val plotW = width - Margin - Pad
    val plotH = height - Margin - Pad
    val fx = if (xMax > xMin) (x - xMin) / (xMax - xMin) else 0.5
    val fy = if (yMax > yMin) (y - yMin) / (yMax - yMin) else 0.5
    (Margin + (fx * plotW).round.toInt,
      (height - Margin) - (fy * plotH).round.toInt)
  }

  /** Render (x, y, label) triples into a PNG scatter at `path`: axes with
    * min/max tick labels, points as filled dots colored by label. Pure
    * JDK; deterministic for a given input. */
  def renderScatterPng(points: Array[(Double, Double, Int)], path: String,
      width: Int = 640, height: Int = 480,
      title: String = "clusters"): Unit = {
    require(points.nonEmpty, "nothing to plot")
    val xs = points.map(_._1)
    val ys = points.map(_._2)
    val (xMin, xMax) = (xs.min, xs.max)
    val (yMin, yMax) = (ys.min, ys.max)
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
        RenderingHints.VALUE_ANTIALIAS_OFF) // deterministic pixels
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, width, height)
      g.setColor(Color.DARK_GRAY)
      g.setStroke(new BasicStroke(1f))
      g.drawLine(Margin, Pad, Margin, height - Margin)               // y axis
      g.drawLine(Margin, height - Margin, width - Pad, height - Margin) // x
      g.drawString(title, Margin, Pad)
      g.drawString(f"$xMin%.3g", Margin, height - Margin + 14)
      g.drawString(f"$xMax%.3g", width - Margin, height - Margin + 14)
      g.drawString(f"$yMin%.3g", 2, height - Margin)
      g.drawString(f"$yMax%.3g", 2, Pad + 10)
      points.foreach { case (x, y, label) =>
        val (px, py) = pixelOf(x, y, xMin, xMax, yMin, yMax, width, height)
        g.setColor(new Color(Palette(math.floorMod(label, Palette.length))))
        g.fillRect(px - 1, py - 1, 3, 3)
      }
    } finally g.dispose()
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    javax.imageio.ImageIO.write(img, "png", f)
    ()
  }

  /** The full S9 sink: bounded scatter data → PNG file. */
  def scatterPng(df: DataFrame, xCol: String, yCol: String,
      labelCol: String, path: String, limit: Int = 10000,
      width: Int = 640, height: Int = 480): Unit =
    renderScatterPng(scatterData(df, xCol, yCol, labelCol, limit), path,
      width, height, title = s"$yCol vs $xCol")
}
