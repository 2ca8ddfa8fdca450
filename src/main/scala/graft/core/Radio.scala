package graft.core

/** Radio-physics scalar functions (H3).
  *
  * Reference: FSPL `viewshed_calc.py:627-633`; earth-curvature height
  * correction `viewshed/refraction_coeff.py:40-43`; refraction
  * constants `viewshed_params.py:28-29`.
  */
object Radio {
  /** Normal correction for visible light (`viewshed_params.py:28`). */
  val AtmosphericRefractionCoeff: Double = 1.0 / 7.0
  /** Radio-wave refraction (`viewshed_params.py:29`). */
  val RfRefractionCoeff: Double = 1.0 / 4.0
  /** WGS84 equatorial radius used by the reference (`refraction_coeff.py:40`). */
  val SphereRadius: Double = 6378137.0
  /** c in (m·MHz): wavelength in meters = this / frequency in MHz. */
  val SpeedOfLightMhzM: Double = 299.792458

  /** Free-space path loss, d in meters, f in MHz
    * (`viewshed_calc.py:627-633`): `20(log₁₀ d + log₁₀ f) − 27.55`.
    */
  def fspl(distM: Double, freqMHz: Double): Double =
    20.0 * (math.log10(distM) + math.log10(freqMHz)) - 27.55

  /** Earth-curvature drop at distance d for refraction coefficient rc
    * (`refraction_coeff.py:40-43`): `−(1−rc)·d²/diameter`.
    */
  def heightCorrection(distM: Double, refractionCoeff: Double,
                       sphereRadius: Double = SphereRadius): Double = {
    val cc = 1.0 - refractionCoeff
    -cc * distM * distM / (2.0 * sphereRadius)
  }

  /** k-factor `1/(1−rc)` (`viewshed_params.py:59-60`). */
  def kFactor(refractionCoeff: Double): Double = 1.0 / (1.0 - refractionCoeff)

  // --- Okumura-Hata median path loss (published empirical model;
  // 150–1500 MHz, d 1–20 km, hb 30–200 m, hm 1–10 m nominal ranges).
  // With FSPL and P.526 knife-edge, the published-public slice of the
  // reference's external rfmodel surface (viewshed_calc.py:792-806).

  /** Small/medium-city mobile-antenna correction a(hm). */
  def hataAHm(freqMhz: Double, hm: Double): Double =
    (1.1 * math.log10(freqMhz) - 0.7) * hm - (1.56 * math.log10(freqMhz) - 0.8)

  /** Urban median loss; f MHz, d km, base/mobile heights in meters. */
  def hataUrban(freqMhz: Double, dKm: Double, hb: Double, hm: Double): Double =
    69.55 + 26.16 * math.log10(freqMhz) - 13.82 * math.log10(hb) -
      hataAHm(freqMhz, hm) +
      (44.9 - 6.55 * math.log10(hb)) * math.log10(dKm)

  def hataSuburban(freqMhz: Double, dKm: Double, hb: Double, hm: Double): Double =
    hataUrban(freqMhz, dKm, hb, hm) -
      2.0 * math.pow(math.log10(freqMhz / 28.0), 2) - 5.4

  def hataOpen(freqMhz: Double, dKm: Double, hb: Double, hm: Double): Double =
    hataUrban(freqMhz, dKm, hb, hm) -
      4.78 * math.pow(math.log10(freqMhz), 2) + 18.33 * math.log10(freqMhz) - 40.94
}
