package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** A2 file-list expansion (`flatten_and_expand_file_list`,
  * `gdalos_util.py:37-66`): recursively flatten nested lists, expand
  * `*`/`?` globs, and expand `.txt` path-list files (one path per
  * line). Driver-side planning code — the result feeds a union of
  * scans.
  */
object FileList {

  def flattenAndExpand(lst: Seq[Any], doExpandTxt: Boolean = true,
                       doExpandGlob: Boolean = true): Seq[String] =
    lst.flatMap {
      case nested: Seq[_] => flattenAndExpand(nested, doExpandTxt, doExpandGlob)
      case s: String      => expandOne(s, doExpandTxt, doExpandGlob)
      case p: Path        => expandOne(p.toString, doExpandTxt, doExpandGlob)
      case other          => Seq(other.toString)
    }

  private def expandOne(s: String, txt: Boolean, glob: Boolean): Seq[String] = {
    val globbed =
      if (glob && (s.contains('*') || s.contains('?'))) expandGlob(s)
      else Seq(s)
    globbed.flatMap { g =>
      if (txt && g.endsWith(".txt") && Files.isRegularFile(Paths.get(g)))
        flattenAndExpand(
          Files.readAllLines(Paths.get(g)).asScala.toSeq
            .map(_.trim).filter(_.nonEmpty),
          txt, glob)
      else Seq(g)
    }
  }

  private def expandGlob(pattern: String): Seq[String] = {
    val p = Paths.get(pattern)
    val dir = Option(p.getParent).getOrElse(Paths.get("."))
    if (!Files.isDirectory(dir)) return Seq.empty
    val matcher = dir.getFileSystem.getPathMatcher("glob:" + p.getFileName.toString)
    val stream = Files.list(dir)
    try stream.iterator.asScala.filter(f => matcher.matches(f.getFileName))
      .map(_.toString).toSeq.sorted
    finally stream.close()
  }
}
