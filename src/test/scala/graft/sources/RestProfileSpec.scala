package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Geodesic, Radio}

/** A14 z_rest client against the in-process stub (zero-egress): slice
  * batching, request/response shapes, and the locally-computed
  * free-space-loss column.
  */
class RestProfileSpec extends SparkSpec {
  import spark.implicits._

  private def pairsDf = (0 until 10).map { i =>
    (i.toLong,
      (i % 3) * 1.0 + 34.0, (i % 3) * 0.5 + 31.0, 10.0 + (i % 3), // 3 origins
      34.5 + i * 0.01, 31.2 + i * 0.02, 5.0, 300.0 + (i % 2) * 100, 90.0 * (i % 2))
  }.toDF("pair_id", "ox", "oy", "oz", "tx", "ty", "tz", "freq_mhz", "pol_deg")

  test("pathLoss: one POST per identical-origin slice; stub formula and local FSPL round-trip") {
    val before = RestProfile.Stub.requestCount.get()
    val cfg = RestProfile.Config(RestProfile.Stub.url, kFactor = 4.0 / 3,
      samplingInterval = 30.0, radioBaseParams = Map("txPowerDbm" -> 43.0))
    // collect WITHOUT a sort above: orderBy would range-sample and
    // re-run the HTTP pass (documented in the pathLoss scaladoc)
    val out = RestProfile.pathLoss(pairsDf, cfg)
      .as[(Long, Double, Boolean, Double)].collect().sortBy(_._1)
    // get_calc_slices semantics: 3 distinct origins -> 3 POSTs total
    assert(RestProfile.Stub.requestCount.get() - before == 3)
    assert(out.map(_._1).toSeq == (0L until 10L))
    // replay the stub's formula: rowId = rank of pair_id within origin
    val rows = pairsDf.collect().map { r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))
    }
    val rowId: Map[Long, Int] = rows.groupBy(r => (r._2, r._3, r._4))
      .iterator.flatMap { case (_, g) =>
        g.sortBy(_._1).zipWithIndex.map { case (r, i) => r._1 -> (i + 1) }
      }.toMap
    for ((id, loss, los, fspl) <- out) {
      val r = rows.find(_._1 == id).get
      val rid = rowId(id)
      assert(loss == 100.0 + 2.0 * rid + r._7 + r._8 / 100.0 + r._4, s"pair $id")
      assert(los == (rid % 2 == 1), s"pair $id")
      // FSPL computed locally from the 2-D Vincenty distance
      val dist = Geodesic.inverse(r._3, r._2, r._6, r._5).distM
      assert(fspl == Radio.fspl(dist, r._8), s"pair $id fspl")
    }
  }

  test("buildRequest carries the reference payload shape; parseResponse demands the table") {
    val slice = Vector(
      RestProfile.PairRow(7L, 34.0, 31.0, 12.0, 34.5, 31.2, 5.0, 400.0, 90.0),
      RestProfile.PairRow(9L, 34.0, 31.0, 12.0, 34.6, 31.3, 6.0, 300.0, 0.0))
    val cfg = RestProfile.Config("http://unused", kFactor = 1.25,
      samplingInterval = 25.0, fernelOrder = 1,
      radioBaseParams = Map("txPowerDbm" -> 40.0))
    val json = RestProfile.buildRequest(slice, cfg)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(json)
    assert(root.path("kFactor").asDouble == 1.25)
    assert(root.path("samplingInterval").asDouble == 25.0)
    assert(root.path("originPointWKTGeoWGS84").asText == "POINT(34.0, 31.0)")
    assert(!root.path("isfeet1").asBoolean)
    assert(root.path("fernelOrder").asInt == 1)
    assert(root.path("originAntHeight").asDouble == 12.0)
    assert(root.path("txPowerDbm").asDouble == 40.0)
    val rows = root.path("destPointsRows")
    assert(rows.size == 2)
    assert(rows.get(0).path("destPointWKTGeoWGS84").asText == "POINT(34.5, 31.2)")
    assert(rows.get(0).path("rowId").asInt == 1 && rows.get(1).path("rowId").asInt == 2)
    assert(rows.get(1).path("frequencyMhz").asDouble == 300.0)
    assert(rows.get(1).path("polarizationDeg").asDouble == 0.0)
    assert(!rows.get(0).path("isfeet").asBoolean)
    // response parsing: table order preserved; missing table refused
    val ok = RestProfile.parseResponse(
      """{"operationResult":{"pathLossTable":[
        |{"medianLoss":101.5,"isRFLOS":true},{"medianLoss":99.25,"isRFLOS":false}]}}""".stripMargin)
    assert(ok == Seq((101.5, true), (99.25, false)))
    assertThrows[IllegalArgumentException](
      RestProfile.parseResponse("""{"operationResult":{}}"""))
  }
}
