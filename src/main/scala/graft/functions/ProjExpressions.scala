package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo, Literal, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}

/** H4 as native Catalyst expressions (SURVEY §7.3 preference order:
  * custom `Expression` with `doGenCode` beats a Scala UDF): UTM ⇄
  * geographic transforms as SQL scalar functions. `doGenCode` emits a
  * direct static call into [[ProjKernels]], so the transform stays
  * inside whole-stage codegen — no UDF boxing, no closure serialization.
  */
abstract class ProjExpr extends TernaryExpression with Serializable {
  def kernel: String // method name on ProjKernels

  // inputs are cast to double at construction (GraftFunctions builders)
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = evalKernel(
    a.asInstanceOf[Double], b.asInstanceOf[Double], c.asInstanceOf[Double])
  protected def evalKernel(a: Double, b: Double, c: Double): Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.ProjKernels.$kernel($a, $b, $c);")
}

case class UtmForwardE(first: Expression, second: Expression, third: Expression)
    extends ProjExpr {
  override def kernel: String = "forwardE"
  override protected def evalKernel(lat: Double, lon: Double, zone: Double): Double =
    ProjKernels.forwardE(lat, lon, zone)
  override def prettyName: String = "utm_forward_e"
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

case class UtmForwardN(first: Expression, second: Expression, third: Expression)
    extends ProjExpr {
  override def kernel: String = "forwardN"
  override protected def evalKernel(lat: Double, lon: Double, zone: Double): Double =
    ProjKernels.forwardN(lat, lon, zone)
  override def prettyName: String = "utm_forward_n"
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

case class UtmInverseLat(first: Expression, second: Expression, third: Expression)
    extends ProjExpr {
  override def kernel: String = "inverseLat"
  override protected def evalKernel(e: Double, n: Double, zone: Double): Double =
    ProjKernels.inverseLat(e, n, zone)
  override def prettyName: String = "utm_inverse_lat"
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

case class UtmInverseLon(first: Expression, second: Expression, third: Expression)
    extends ProjExpr {
  override def kernel: String = "inverseLon"
  override protected def evalKernel(e: Double, n: Double, zone: Double): Double =
    ProjKernels.inverseLon(e, n, zone)
  override def prettyName: String = "utm_inverse_lon"
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

/** 4-ary projection expression (point + projection center), same
  * static-kernel codegen contract as [[ProjExpr]].
  */
abstract class Proj4Expr extends QuaternaryExpression with Serializable {
  def kernel: String

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = evalKernel(
    a.asInstanceOf[Double], b.asInstanceOf[Double],
    c.asInstanceOf[Double], d.asInstanceOf[Double])
  protected def evalKernel(a: Double, b: Double, c: Double, d: Double): Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.ProjKernels.$kernel($a, $b, $c, $d);")
}

case class AeqdForwardX(first: Expression, second: Expression,
                        third: Expression, fourth: Expression) extends Proj4Expr {
  override def kernel: String = "aeqdForwardX"
  override protected def evalKernel(lat: Double, lon: Double, lat0: Double, lon0: Double): Double =
    ProjKernels.aeqdForwardX(lat, lon, lat0, lon0)
  override def prettyName: String = "aeqd_forward_x"
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

case class AeqdForwardY(first: Expression, second: Expression,
                        third: Expression, fourth: Expression) extends Proj4Expr {
  override def kernel: String = "aeqdForwardY"
  override protected def evalKernel(lat: Double, lon: Double, lat0: Double, lon0: Double): Double =
    ProjKernels.aeqdForwardY(lat, lon, lat0, lon0)
  override def prettyName: String = "aeqd_forward_y"
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

case class AeqdInverseLat(first: Expression, second: Expression,
                          third: Expression, fourth: Expression) extends Proj4Expr {
  override def kernel: String = "aeqdInverseLat"
  override protected def evalKernel(x: Double, y: Double, lat0: Double, lon0: Double): Double =
    ProjKernels.aeqdInverseLat(x, y, lat0, lon0)
  override def prettyName: String = "aeqd_inverse_lat"
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

case class AeqdInverseLon(first: Expression, second: Expression,
                          third: Expression, fourth: Expression) extends Proj4Expr {
  override def kernel: String = "aeqdInverseLon"
  override protected def evalKernel(x: Double, y: Double, lat0: Double, lon0: Double): Double =
    ProjKernels.aeqdInverseLon(x, y, lat0, lon0)
  override def prettyName: String = "aeqd_inverse_lon"
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

case class AeqdSphereForwardX(first: Expression, second: Expression,
                              third: Expression, fourth: Expression) extends Proj4Expr {
  override def kernel: String = "aeqdSphereForwardX"
  override protected def evalKernel(lat: Double, lon: Double, lat0: Double, lon0: Double): Double =
    ProjKernels.aeqdSphereForwardX(lat, lon, lat0, lon0)
  override def prettyName: String = "aeqd_sphere_forward_x"
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

case class AeqdSphereForwardY(first: Expression, second: Expression,
                              third: Expression, fourth: Expression) extends Proj4Expr {
  override def kernel: String = "aeqdSphereForwardY"
  override protected def evalKernel(lat: Double, lon: Double, lat0: Double, lon0: Double): Double =
    ProjKernels.aeqdSphereForwardY(lat, lon, lat0, lon0)
  override def prettyName: String = "aeqd_sphere_forward_y"
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

case class AeqdSphereInverseLat(first: Expression, second: Expression,
                                third: Expression, fourth: Expression) extends Proj4Expr {
  override def kernel: String = "aeqdSphereInverseLat"
  override protected def evalKernel(x: Double, y: Double, lat0: Double, lon0: Double): Double =
    ProjKernels.aeqdSphereInverseLat(x, y, lat0, lon0)
  override def prettyName: String = "aeqd_sphere_inverse_lat"
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

case class AeqdSphereInverseLon(first: Expression, second: Expression,
                                third: Expression, fourth: Expression) extends Proj4Expr {
  override def kernel: String = "aeqdSphereInverseLon"
  override protected def evalKernel(x: Double, y: Double, lat0: Double, lon0: Double): Double =
    ProjKernels.aeqdSphereInverseLon(x, y, lat0, lon0)
  override def prettyName: String = "aeqd_sphere_inverse_lon"
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** 2-ary projection expression (a point), same static-kernel codegen
  * contract as [[ProjExpr]] — the datum-shift surface.
  */
abstract class Proj2Expr extends BinaryExpression with Serializable {
  def kernel: String

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    evalKernel(a.asInstanceOf[Double], b.asInstanceOf[Double])
  protected def evalKernel(a: Double, b: Double): Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ProjKernels.$kernel($a, $b);")
}

case class Ed50ToWgs84Lat(left: Expression, right: Expression) extends Proj2Expr {
  override def kernel: String = "ed50ToWgs84Lat"
  override protected def evalKernel(lat: Double, lon: Double): Double =
    ProjKernels.ed50ToWgs84Lat(lat, lon)
  override def prettyName: String = "ed50_to_wgs84_lat"
  override protected def withNewChildrenInternal(a: Expression, b: Expression): Expression =
    copy(left = a, right = b)
}

case class Ed50ToWgs84Lon(left: Expression, right: Expression) extends Proj2Expr {
  override def kernel: String = "ed50ToWgs84Lon"
  override protected def evalKernel(lat: Double, lon: Double): Double =
    ProjKernels.ed50ToWgs84Lon(lat, lon)
  override def prettyName: String = "ed50_to_wgs84_lon"
  override protected def withNewChildrenInternal(a: Expression, b: Expression): Expression =
    copy(left = a, right = b)
}

case class Wgs84ToEd50Lat(left: Expression, right: Expression) extends Proj2Expr {
  override def kernel: String = "wgs84ToEd50Lat"
  override protected def evalKernel(lat: Double, lon: Double): Double =
    ProjKernels.wgs84ToEd50Lat(lat, lon)
  override def prettyName: String = "wgs84_to_ed50_lat"
  override protected def withNewChildrenInternal(a: Expression, b: Expression): Expression =
    copy(left = a, right = b)
}

case class Wgs84ToEd50Lon(left: Expression, right: Expression) extends Proj2Expr {
  override def kernel: String = "wgs84ToEd50Lon"
  override protected def evalKernel(lat: Double, lon: Double): Double =
    ProjKernels.wgs84ToEd50Lon(lat, lon)
  override def prettyName: String = "wgs84_to_ed50_lon"
  override protected def withNewChildrenInternal(a: Expression, b: Expression): Expression =
    copy(left = a, right = b)
}

case class UtmForwardEIntl(first: Expression, second: Expression, third: Expression)
    extends ProjExpr {
  override def kernel: String = "forwardEIntl"
  override protected def evalKernel(lat: Double, lon: Double, zone: Double): Double =
    ProjKernels.forwardEIntl(lat, lon, zone)
  override def prettyName: String = "utm_forward_e_intl"
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

case class UtmForwardNIntl(first: Expression, second: Expression, third: Expression)
    extends ProjExpr {
  override def kernel: String = "forwardNIntl"
  override protected def evalKernel(lat: Double, lon: Double, zone: Double): Double =
    ProjKernels.forwardNIntl(lat, lon, zone)
  override def prettyName: String = "utm_forward_n_intl"
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

case class UtmInverseLatIntl(first: Expression, second: Expression, third: Expression)
    extends ProjExpr {
  override def kernel: String = "inverseLatIntl"
  override protected def evalKernel(e: Double, n: Double, zone: Double): Double =
    ProjKernels.inverseLatIntl(e, n, zone)
  override def prettyName: String = "utm_inverse_lat_intl"
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

case class UtmInverseLonIntl(first: Expression, second: Expression, third: Expression)
    extends ProjExpr {
  override def kernel: String = "inverseLonIntl"
  override protected def evalKernel(e: Double, n: Double, zone: Double): Double =
    ProjKernels.inverseLonIntl(e, n, zone)
  override def prettyName: String = "utm_inverse_lon_intl"
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

/** Function registry wiring — either per-session
  * ([[GraftFunctions.register]]) or engine-wide via
  * `spark.sql.extensions=graft.functions.GraftExtensions`
  * (SparkSessionExtensions.injectFunction).
  */
object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  private def d(e: Expression): Expression = Cast(e, DoubleType)

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    fn("utm_forward_e", "easting of (lat, lon) in UTM zone",
      args => UtmForwardE(d(args(0)), d(args(1)), d(args(2)))),
    fn("utm_forward_n", "northing of (lat, lon) in UTM zone",
      args => UtmForwardN(d(args(0)), d(args(1)), d(args(2)))),
    fn("utm_inverse_lat", "latitude of (easting, northing) in UTM zone",
      args => UtmInverseLat(d(args(0)), d(args(1)), d(args(2)))),
    fn("utm_inverse_lon", "longitude of (easting, northing) in UTM zone",
      args => UtmInverseLon(d(args(0)), d(args(1)), d(args(2)))),
    fn("aeqd_forward_x", "x of (lat, lon) in aeqd centered (lat0, lon0)",
      args => AeqdForwardX(d(args(0)), d(args(1)), d(args(2)), d(args(3)))),
    fn("aeqd_forward_y", "y of (lat, lon) in aeqd centered (lat0, lon0)",
      args => AeqdForwardY(d(args(0)), d(args(1)), d(args(2)), d(args(3)))),
    fn("aeqd_inverse_lat", "latitude of (x, y) in aeqd centered (lat0, lon0)",
      args => AeqdInverseLat(d(args(0)), d(args(1)), d(args(2)), d(args(3)))),
    fn("aeqd_inverse_lon", "longitude of (x, y) in aeqd centered (lat0, lon0)",
      args => AeqdInverseLon(d(args(0)), d(args(1)), d(args(2)), d(args(3)))),
    fn("aeqd_sphere_forward_x", "x of (lat, lon) in spherical aeqd centered (lat0, lon0)",
      args => AeqdSphereForwardX(d(args(0)), d(args(1)), d(args(2)), d(args(3)))),
    fn("aeqd_sphere_forward_y", "y of (lat, lon) in spherical aeqd centered (lat0, lon0)",
      args => AeqdSphereForwardY(d(args(0)), d(args(1)), d(args(2)), d(args(3)))),
    fn("aeqd_sphere_inverse_lat", "latitude of (x, y) in spherical aeqd centered (lat0, lon0)",
      args => AeqdSphereInverseLat(d(args(0)), d(args(1)), d(args(2)), d(args(3)))),
    fn("aeqd_sphere_inverse_lon", "longitude of (x, y) in spherical aeqd centered (lat0, lon0)",
      args => AeqdSphereInverseLon(d(args(0)), d(args(1)), d(args(2)), d(args(3)))),
    fn("ed50_to_wgs84_lat", "WGS84 latitude of an ED50 (lat, lon)",
      args => Ed50ToWgs84Lat(d(args(0)), d(args(1)))),
    fn("ed50_to_wgs84_lon", "WGS84 longitude of an ED50 (lat, lon)",
      args => Ed50ToWgs84Lon(d(args(0)), d(args(1)))),
    fn("wgs84_to_ed50_lat", "ED50 latitude of a WGS84 (lat, lon)",
      args => Wgs84ToEd50Lat(d(args(0)), d(args(1)))),
    fn("wgs84_to_ed50_lon", "ED50 longitude of a WGS84 (lat, lon)",
      args => Wgs84ToEd50Lon(d(args(0)), d(args(1)))),
    fn("utm_forward_e_intl", "easting of (lat, lon) in an ED50/Intl UTM zone",
      args => UtmForwardEIntl(d(args(0)), d(args(1)), d(args(2)))),
    fn("utm_forward_n_intl", "northing of (lat, lon) in an ED50/Intl UTM zone",
      args => UtmForwardNIntl(d(args(0)), d(args(1)), d(args(2)))),
    fn("utm_inverse_lat_intl", "latitude of (easting, northing) in an ED50/Intl UTM zone",
      args => UtmInverseLatIntl(d(args(0)), d(args(1)), d(args(2)))),
    fn("utm_inverse_lon_intl", "longitude of (easting, northing) in an ED50/Intl UTM zone",
      args => UtmInverseLonIntl(d(args(0)), d(args(1)), d(args(2)))),
    fn("vec_dot", "dot product of two numeric arrays (codegen loop)",
      args => VecDot(args(0), args(1))),
    fn("vec_sqdist", "squared Euclidean distance of two numeric arrays (codegen loop)",
      args => VecSqDist(args(0), args(1))),
    fn("vec_jl_project", "JL ±1-signed projection components of a numeric array",
      args => VecJlProject(args(0), args(1))),
    fn("vec_lsh_bucket", "hyperplane LSH bucket id of a numeric array",
      args => VecLshBucket(args(0), args(1))),
    fn("tile_pack", "double tile array to LE binary samples of a dtype width",
      args => TilePack(args(0), args(1))),
    fn("tile_unpack", "LE binary tile samples back to a double array",
      args => TileUnpack(args(0), args(1))),
    fn("winnow_fps", "distinct winnowing fingerprints of a document (char k-grams, window w)",
      args => WinnowFps(args(0), constInt(args(1), "k"), constInt(args(2), "w"))),
    fn("substr_window_hashes", "distinct k-char-window hashes of a document at a stride",
      args => SubstrWindowHashes(args(0), constInt(args(1), "k"), constInt(args(2), "stride"))),
    fn("md5_prefix60", "top 60 bits of md5 as BIGINT (= conv(substring(md5(s),1,15),16,10))",
      args => Md5Prefix60(args(0))),
    fn("shingles", "per-position word n-grams of a document",
      args => Shingles(args(0), constInt(args(1), "n"))),
    fn("winnow_pos", "winnowing-selected (pos, fp) pairs of a document",
      args => WinnowPos(args(0), constInt(args(1), "k"), constInt(args(2), "w"))),
    fn("cdc_chunks", "content-defined chunk (start, len, h) structs of a document",
      args => CdcChunks(args(0), constInt(args(1), "k"), constInt(args(2), "d"))),
    fn("minhash_sig", "distinct shingle set + MinHash signature of a document",
      args => MinhashSig(args(0), constInt(args(1), "n"), constInt(args(2), "numHashes"))),
    fn("hashed_ngram_score", "hashed unigram+bigram classifier gram count and weight sum",
      args => HashedNgramScore(args(0), constInt(args(1), "buckets"))),
    fn("hashed_gram_hist", "hashed unigram+bigram bucket histogram of a document",
      args => HashedGramHist(args(0), constInt(args(1), "buckets"))),
    fn("gram_counts", "distinct word n-grams of a document with multiplicities",
      args => GramCounts(args(0), constInt(args(1), "n"))),
    fn("bpe_merge", "one greedy BPE merge round over a symbol array",
      args => BpeMerge(args(0), constStr(args(1), "l"), constStr(args(2), "r"))),
    fn("ac_term_hits", "per-lexicon-term occurrence counts in one Aho-Corasick pass",
      args => AcTermHits(args(0), constStrSeq(args(1), "terms"))))

  private def constInt(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private def constStr(e: Expression, name: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$name must be a string literal, got $other")
  }

  private def constStrSeq(e: Expression, name: String): Seq[String] = {
    // element type and nulls are validated explicitly (round-13
    // advice): a foldable array of NON-strings, or a null element,
    // must surface as the intended IllegalArgumentException at plan
    // time — not as a ClassCastException/NPE from the blind
    // toObjectArray(StringType) cast below
    def elems(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
      a.toObjectArray(StringType).toSeq.map {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case _ => throw new IllegalArgumentException(
          s"$name must be a constant array of non-null strings, got $e")
      }
    def isStrArray = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) => true
      case _ => false
    }
    e match {
      // a foldable array literal (array('a','b') folds to this) — the
      // lexicon shapes the automaton baked into the plan, not the data
      case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData, _)
          if isStrArray => elems(v)
      case other if other.foldable && isStrArray =>
        other.eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData => elems(a)
          case _ => throw new IllegalArgumentException(
            s"$name must be a constant array of strings, got $other")
        }
      case other => throw new IllegalArgumentException(
        s"$name must be a constant array of strings, got $other")
    }
  }

  private def fn(name: String, usage: String, b: Builder) =
    (new FunctionIdentifier(name), new ExpressionInfo("graft", name, usage), b)

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  /** [[Md5Prefix60]] as a registry-free Column (the hash helper rides
    * inside pure Column builders — [[graft.llm.Sampling.hashUniformCol]]
    * and friends — that have no SparkSession in scope to register on);
    * the Expression↔Column bridge lives in the [[Md5Cols]] Java shim
    * (Spark's ExpressionUtils is private[sql] to Scala only).
    */
  def md5Prefix60Col(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Md5Cols.md5Prefix60Col(c)
}

/** `spark.sql.extensions` entry point: functions + optimizer rules. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.TileFilterPushdown)
  }
}
