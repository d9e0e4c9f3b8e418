package graft

import org.apache.spark.sql.functions._
import graft.etl.Enrich

/** Categorizer truth tables — mirrors the reference's boundary tests
  * (reference: tests/test_transform.py:208-294).
  */
class EnrichSpec extends SparkSpec {
  import spark.implicits._

  private def one(expr: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(expr).first().get(0)

  test("season covers all 12 months") {
    val expected = Map(
      12 -> "Winter", 1 -> "Winter", 2 -> "Winter",
      3 -> "Spring", 4 -> "Spring", 5 -> "Spring",
      6 -> "Summer", 7 -> "Summer", 8 -> "Summer",
      9 -> "Autumn", 10 -> "Autumn", 11 -> "Autumn")
    expected.foreach { case (m, season) =>
      val ts = f"2023-$m%02d-15 12:00:00"
      assert(one(Enrich.season(lit(ts).cast("timestamp"))) == season, s"month $m")
    }
  }

  test("temperature bands at reference boundary probes") {
    // reference: tests/test_transform.py:225-234 (-5/5/15/22/27/35)
    val cases = Seq(-5.0 -> "Freezing", 5.0 -> "Cold", 15.0 -> "Cool",
      22.0 -> "Mild", 27.0 -> "Warm", 35.0 -> "Hot",
      // half-open band edges
      0.0 -> "Cold", 10.0 -> "Cool", 20.0 -> "Mild", 25.0 -> "Warm", 30.0 -> "Hot")
    cases.foreach { case (t, cat) =>
      assert(one(Enrich.tempCategory(lit(t))) == cat, s"temp $t")
    }
  }

  test("humidity bands") {
    Seq(25 -> "Low", 45 -> "Moderate", 75 -> "High", 30 -> "Moderate", 60 -> "High")
      .foreach { case (h, cat) =>
        assert(one(Enrich.humidityCategory(lit(h))) == cat, s"humidity $h")
      }
  }

  test("wind bands (Beaufort-ish, 7 bands)") {
    Seq(0.5 -> "Calm", 3.0 -> "Light", 8.0 -> "Gentle", 15.0 -> "Moderate",
      25.0 -> "Fresh", 35.0 -> "Strong", 45.0 -> "Gale")
      .foreach { case (w, cat) =>
        assert(one(Enrich.windCategory(lit(w))) == cat, s"wind $w")
      }
  }

  test("comfort index: humid adds, dry subtracts, else identity") {
    // reference: tests/test_transform.py:256-272
    assert(one(Enrich.comfortIndex(lit(20.0), lit(50))) == 20.0)
    assert(one(Enrich.comfortIndex(lit(20.0), lit(80))) == 21.0)  // +((80-70)*0.1)
    assert(one(Enrich.comfortIndex(lit(20.0), lit(20))) == 19.5)  // -((30-20)*0.05)
  }

  test("quality score: penalties ordered, clipped to [0,100]") {
    // reference: tests/test_transform.py:274-294
    val perfect = one(Enrich.qualityScore(lit(5.0), lit(10.0), lit(20.0)))
    val nullWind = one(Enrich.qualityScore(lit(null).cast("double"), lit(10.0), lit(20.0)))
    val extreme = one(Enrich.qualityScore(lit(150.0), lit(0.0), lit(50.0)))
    assert(perfect == 100.0)
    assert(nullWind == 95.0)
    assert(extreme == 82.0) // -3 zero vis, -5 hot, -10 wind>100
  }

  test("derived date parts: English day/month names") {
    val ts = lit("2023-11-07 14:30:00").cast("timestamp")
    assert(one(Enrich.deriveHour(ts)) == 14)
    assert(one(Enrich.dayName(ts)) == "Tuesday")
    assert(one(Enrich.monthName(ts)) == "November")
    assert(one(Enrich.deriveDate(ts)).toString == "2023-11-07")
  }
}
