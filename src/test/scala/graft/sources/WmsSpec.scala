package graft.sources

import graft.SparkSpec

/** A1 WMS: GDAL-WMS config XML parse, TMS URL templating (both Y
  * origins), distributed tile grid, and the HTTP fetch + decode path
  * against the in-process stub (pixel contract
  * v = (gx*3 + gy*7) % 251, 32x32 tiles — deliberately distinct from
  * the GPKG fixture's (3,5)).
  */
class WmsSpec extends SparkSpec {

  private def demoCfg = Wms.parseConfig(Wms.demoConfigXml("http://example.invalid"))

  test("parseConfig: demo XML round-trips the GDAL WMS fields") {
    val cfg = demoCfg
    assert(cfg.serviceName == "TMS")
    assert(cfg.serverUrl == "http://example.invalid/wms/${z}/${x}/${y}.png")
    assert(cfg.ulx == 35.0 && cfg.uly == 33.0 && cfg.lrx == 37.0 && cfg.lry == 31.0)
    assert(cfg.tileCountX == 1 && cfg.tileCountY == 1)
    assert(cfg.blockSizeX == 32 && cfg.blockSizeY == 32)
    assert(cfg.bandsCount == 1 && cfg.projection == "EPSG:4326")
    assert(cfg.yOrigin == "top")
  }

  test("parseConfig: defaults fill absent fields; missing ServerUrl fails loudly") {
    val minimal = Wms.parseConfig(
      "<GDAL_WMS><Service name=\"TMS\"><ServerUrl>http://h/${z}/${x}/${y}</ServerUrl></Service></GDAL_WMS>")
    assert(minimal.tileCountX == 1 && minimal.blockSizeX == 256 &&
      minimal.bandsCount == 3 && minimal.yOrigin == "top")
    intercept[IllegalArgumentException](Wms.parseConfig("<GDAL_WMS></GDAL_WMS>"))
  }

  test("urlFor: template expansion and YOrigin=bottom flip") {
    val top = demoCfg
    assert(Wms.urlFor(top, 1, 0, 0) == "http://example.invalid/wms/1/0/0.png")
    assert(Wms.urlFor(top, 1, 1, 0) == "http://example.invalid/wms/1/1/0.png")
    val bottom = top.copy(yOrigin = "bottom")
    // level 1 has 2 rows: internal top row 0 is wire row 1 and vice versa
    assert(Wms.urlFor(bottom, 1, 0, 0) == "http://example.invalid/wms/1/0/1.png")
    assert(Wms.urlFor(bottom, 1, 0, 1) == "http://example.invalid/wms/1/0/0.png")
  }

  test("tileGrid: level doubling, never a driver-side list") {
    val cfg = demoCfg
    assert(Wms.tileGrid(spark, cfg, 0).count() == 1L)
    val g1 = Wms.tileGrid(spark, cfg, 1).collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(g1 == Set((1, 0, 0), (1, 1, 0), (1, 0, 1), (1, 1, 1)))
    assert(Wms.tileGrid(spark, cfg, 5).count() == 32L * 32L)
  }

  test("pixelFrame: fetches from the stub and decodes the pixel contract") {
    val cfg = Wms.parseConfig(Wms.demoConfigXml(Wms.Stub.url))
    val before = Wms.Stub.requestCount.get()
    val rows = Wms.pixelFrame(spark, cfg, level = 1)
      .collect().map(r => ((r.getInt(2), r.getInt(3)), r.getDouble(4))).toMap
    assert(rows.size == 64 * 64)
    // spot-check the formula across tile boundaries
    for ((px, py) <- Seq((0, 0), (31, 31), (32, 0), (0, 32), (63, 63), (40, 17)))
      assert(rows((px, py)) == ((px * 3 + py * 7) % 251).toDouble, s"($px,$py)")
    // one HTTP request per tile, no more
    assert(Wms.Stub.requestCount.get() - before == 4)
  }

  test("pixelFrame: a tile-size mismatch fails loudly, never a silent hole") {
    val cfg = Wms.parseConfig(Wms.demoConfigXml(Wms.Stub.url))
      .copy(blockSizeX = 64, blockSizeY = 64)
    val e = intercept[org.apache.spark.SparkException] {
      Wms.pixelFrame(spark, cfg, 0).collect()
    }
    assert(e.getMessage != null)
  }
}
