package graft.sources

import graft.score.IsolationForest.{ITree, Leaf, Model, Split}
import graft.score.LinearAE
import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

/** Artifact persistence (reference SURVEY.md §2.1 S6/S7): golden
  * threshold scalars as plain-text float files
  * (`dataset/thresholds/<name>.txt`, `app/AE_model.py:233-246`) and fitted
  * model state. Doubles round-trip via `Double.toString`/`parseDouble`
  * (exact for all finite values), so save→load→score is bitwise
  * reproducible. Model files are driver-side artifacts (a few KB) —
  * they ride the broadcast path at scoring time, not the data path.
  */
object Persist {

  private def write(path: String, s: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, s)
  }

  // --- thresholds (S7) ------------------------------------------------ //

  def saveThreshold(path: String, value: Double): Unit =
    write(path, value.toString)

  def loadThreshold(path: String): Double =
    Files.readString(Paths.get(path)).trim.toDouble

  // --- isolation forest ----------------------------------------------- //

  private def encodeTree(t: ITree, sb: StringBuilder): Unit = t match {
    case Leaf(n) => sb.append("L ").append(n).append(' ')
    case Split(f, v, l, r) =>
      sb.append("S ").append(f).append(' ').append(v).append(' ')
      encodeTree(l, sb)
      encodeTree(r, sb)
  }

  private def decodeTree(tok: Iterator[String]): ITree = tok.next() match {
    case "L" => Leaf(tok.next().toInt)
    case "S" =>
      val f = tok.next().toInt
      val v = tok.next().toDouble
      Split(f, v, decodeTree(tok), decodeTree(tok))
  }

  def saveIsolationForest(path: String, m: Model): Unit = {
    val lines = m.sampleSize.toString +: m.trees.map { t =>
      val sb = new StringBuilder
      encodeTree(t, sb)
      sb.result().trim
    }.toSeq
    write(path, lines.mkString("\n"))
  }

  def loadIsolationForest(path: String): Model = {
    val lines = Files.readAllLines(Paths.get(path)).asScala.toSeq
    val trees = lines.tail.map(l => decodeTree(l.split(' ').iterator)).toArray
    new Model(trees, lines.head.trim.toInt)
  }

  // --- linear AE ------------------------------------------------------- //

  def saveLinearAE(path: String, m: LinearAE.Model): Unit = {
    val lines = m.mean.mkString(",") +: m.components.map(_.mkString(",")).toSeq
    write(path, lines.mkString("\n"))
  }

  def loadLinearAE(path: String): LinearAE.Model = {
    val lines = Files.readAllLines(Paths.get(path)).asScala.toSeq
    new LinearAE.Model(
      lines.head.split(',').map(_.toDouble),
      lines.tail.map(_.split(',').map(_.toDouble)).toArray)
  }

  // --- MLP AE ---------------------------------------------------------- //

  /** Layout: mean / std / b1 / b2, then `#b1` rows of W1, then `#b2`
    * rows of W2 — plain comma-joined doubles, exact round-trip.
    */
  def saveMlpAE(path: String, m: graft.score.MlpAE.Model): Unit = {
    val lines = Seq(m.mean, m.std, m.b1, m.b2).map(_.mkString(",")) ++
      m.w1.map(_.mkString(",")).toSeq ++ m.w2.map(_.mkString(",")).toSeq
    write(path, lines.mkString("\n"))
  }

  def loadMlpAE(path: String): graft.score.MlpAE.Model = {
    val lines = Files.readAllLines(Paths.get(path)).asScala.toSeq
      .map(_.split(',').map(_.toDouble))
    val Seq(mean, std, b1, b2) = lines.take(4)
    val w1 = lines.slice(4, 4 + b1.length).toArray
    val w2 = lines.slice(4 + b1.length, 4 + b1.length + b2.length).toArray
    new graft.score.MlpAE.Model(mean, std, w1, b1, w2, b2)
  }
}
