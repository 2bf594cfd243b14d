package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.{GraftExtensions, VectorFunctions}

/** Native codegen'd vector expressions: interpreted eval vs codegen vs a
  * reference fold must agree bit-exactly, and the SparkSessionExtensions
  * injection must make the functions SQL-visible. */
class VectorFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def referenceDot(a: Seq[Float], b: Seq[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < math.min(a.size, b.size)) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  test("graft_dot matches a reference sequential fold bit-exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(1)
    val vecs = Seq.fill(50)((Seq.fill(64)(rnd.nextFloat() - 0.5f),
      Seq.fill(64)(rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("a", "b")
    VectorFunctions.register(spark)
    val got = df.select(call_function("graft_dot", col("a"), col("b"))).collect()
      .map(_.getDouble(0))
    val want = vecs.map { case (a, b) => referenceDot(a, b) }
    assert(got.toSeq == want)
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    VectorFunctions.register(spark)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = df.select(call_function("graft_dot", col("a"), col("b"))).head.getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val gen = df.select(call_function("graft_dot", col("a"), col("b"))).head.getDouble(0)
    assert(interp == gen && gen == 32.0)
  }

  test("extensions make the functions visible in SQL") {
    val r = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d, " +
        "graft_l2norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n")
      .head
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0)
  }

  test("nulls propagate") {
    VectorFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(NULL, array(CAST(1.0 AS FLOAT)))").head
    assert(r.isNullAt(0))
  }

  /** The native SQ8-error kernel must be BIT-COMPATIBLE with the Scala
    * UDF it replaced (q155's oracle was proven against that loop):
    * same round-once micro-units, same max/truncating-mean, identical
    * on both the interpreted and codegen paths. */
  test("graft_sq8err equals the reference decode loop on both paths") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def quantize(v: Array[Float]): (Double, Array[Byte]) = {
      val ma = v.map(x => math.abs(x.toDouble)).max
      val scale = 127.0 / ma
      (scale, v.map(x => math.floor(x.toDouble * scale + 0.5).toByte))
    }
    def ref(emb: Array[Float], scale: Double, code: Array[Byte]): (Long, Long) = {
      var maxu = 0L; var sumu = 0L; var i = 0
      while (i < code.length) {
        val e = math.abs(emb(i).toDouble - code(i).toDouble / scale)
        val u = math.round(e * 1e6)
        if (u > maxu) maxu = u
        sumu += u; i += 1
      }
      (maxu, sumu / code.length)
    }
    val rows = Seq.fill(40)(Array.fill(64)(rnd.nextFloat() - 0.5f))
      .map { v => val (s, c) = quantize(v); (v.toSeq, s, c) }
    val df = rows.toDF("emb", "scale", "code")
    VectorFunctions.register(spark)
    def run(): Seq[(Long, Long)] =
      df.select(call_function("graft_sq8err",
          col("emb"), col("scale"), col("code")).as("e"))
        .select(col("e").getItem(0), col("e").getItem(1)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = rows.map { case (v, s, c) => ref(v.toArray, s, c) }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val gen = run()
    assert(interp == want, "interpreted path diverges from the UDF loop")
    assert(gen == want, "codegen path diverges from the UDF loop")
  }

  /** The native charfold must be BIT-COMPATIBLE with the HOF
    * formulation it replaced (`aggregate(transform(split(s, ''),
    * ascii), 0, (a,c)->(a*31+c)%p)`) — oracles were proven against
    * that form. Property-checked across ASCII, Latin-1, CJK, emoji
    * (surrogate pairs — split('') yields code points, never lone
    * surrogates), the empty string, and random unicode. */
  test("graft_charfold equals the HOF char fold across unicode edges") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def randStr(): String = {
      val sb = new StringBuilder
      (0 until rnd.nextInt(40)).foreach { _ =>
        val cp = rnd.nextInt(5) match {
          case 0 => rnd.nextInt(0x80)                    // ASCII
          case 1 => 0xA0 + rnd.nextInt(0xFF - 0xA0)      // Latin-1
          case 2 => 0x4E00 + rnd.nextInt(0x100)          // CJK
          case 3 => 0x1F600 + rnd.nextInt(0x50)          // emoji (astral)
          case _ => { var c = rnd.nextInt(0x2FFFF)       // anything valid
            while (Character.isSurrogate(c.toChar) && c <= 0xFFFF)
              c = rnd.nextInt(0x2FFFF); c }
        }
        sb.appendAll(Character.toChars(cp))
      }
      sb.toString
    }
    val cases = Seq("", " ", "a", "dup merge scan", "élève",
      "你好世界", new String(Character.toChars(0x1F600)) * 3) ++
      (0 until 200).map(_ => randStr())
    val df = cases.toDF("s")
    val hof = aggregate(transform(split(col("s"), ""), c => ascii(c).cast("long")),
      lit(0L), (a, c) => (a * 31 + c) % 1000000007L)
    val rows = df.select(col("s"),
        graft.llm.TextAnalysis.charFold(col("s")).as("native"), hof.as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"diverged on ${r.getString(0)}")
    }
    // and the extension-injected SQL name resolves to the same value
    val viaSql = spark.sql("SELECT graft_charfold('dup merge scan')").head.getLong(0)
    assert(viaSql == rows.find(_.getString(0) == "dup merge scan").get.getLong(1))
  }
}
