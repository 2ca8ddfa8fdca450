package graft.sources

import graft.SparkSpec

/** A1 GPKG: the pure-JDK SQLite b-tree reader against the committed
  * fixture (tools/make_gpkg_fixture.py — pixel contract
  * v = (px*3 + py*5) % 251 in the R channel, 2x2 tiles of 64x64).
  * The fixture's ~13 KB tile blobs spill into SQLite overflow-page
  * chains at the 4096 page size, so the spill path is exercised, not
  * just the inline one.
  */
class GpkgSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Gpkg.demoFixture()

  test("readTiles: contents, tile matrix, and overflow-chained blobs") {
    val (c, matrices, tiles) = Gpkg.readTiles(fixture)
    assert(c.tableName == "demo_tiles" && c.srsId == 4326L)
    assert(c.minX == 35.0 && c.maxY == 30.128)
    assert(matrices == Seq(Gpkg.TileMatrix(0, 2, 2, 64, 64, 0.001, 0.001)))
    assert(tiles.map(t => (t.zoom, t.col, t.row)).toSet ==
      Set((0, 0, 0), (0, 1, 0), (0, 0, 1), (0, 1, 1)))
    // the blobs are larger than one 4096 page -> overflow chains read
    assert(tiles.forall(_.data.length > 4096))
    // every blob decodes as a PNG of the declared tile size
    tiles.foreach { t =>
      val (w, h, _) = Png.decode(t.data)
      assert(w == 64 && h == 64, s"tile (${t.col},${t.row})")
    }
  }

  test("pixelFrame: distributed decode reproduces the generator formula") {
    val px = Gpkg.pixelFrame(spark, fixture)
      .select("px", "py", "v").as[(Int, Int, Double)].collect()
    assert(px.length == 128 * 128)
    px.foreach { case (x, y, v) =>
      assert(v == ((x * 3 + y * 5) % 251).toDouble, s"pixel ($x,$y)")
    }
    // non-SQLite input is refused with a clear message (any committed
    // non-SQLite file will do — no dependency outside the checkout)
    val err = intercept[IllegalArgumentException](
      Gpkg.readTiles("build.sbt"))
    assert(err.getMessage.contains("not an SQLite"))
  }
}
