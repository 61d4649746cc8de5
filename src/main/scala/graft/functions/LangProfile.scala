package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Cavnar–Trenkle n-gram-profile language ID (Cavnar & Trenkle 1994,
  * "N-Gram-Based Text Categorization" — public algorithm) as a native
  * Catalyst expression: per document, rank its character 1–3-grams by
  * frequency, compare the top-[[ProfileDepth]] ranking against each
  * language's reference profile by out-of-place distance, and emit the
  * argmin language plus its distance.
  *
  * Everything is integer arithmetic over a deterministic gram
  * definition, so an external SQL engine can replay the WHOLE
  * classification — profiles included — from the same embedded
  * [[TrainingText]] (see the `text_lang_id` oracle, which derives the
  * language profiles in a CTE rather than trusting the engine's).
  * Evaluation is one static call per row ([[classify]]) with the
  * prebuilt profile maps riding as codegen reference objects — the
  * same no-UDF corpus-scan discipline as [[TextSketch]].
  *
  * Gram definition (shared verbatim by the SQL oracle):
  *  - normalize: map every char outside [a-zA-Z] to a space, ASCII
  *    lowercase, collapse space runs, trim, pad with ONE leading and
  *    trailing space;
  *  - grams: every substring of length 1, 2, 3 containing at least one
  *    letter;
  *  - doc profile: top [[ProfileDepth]] grams by (count desc, gram
  *    asc), ranks 1-based;
  *  - distance: Σ over doc grams of |doc rank − profile rank|, with
  *    [[ProfileDepth]] as the out-of-profile penalty;
  *  - prediction: the lexicographically-first language among those
  *    with minimal distance.
  */
object LangProfile {

  /** Profile depth K: doc and language profiles keep their top-K
    * grams; a gram absent from the language profile costs K. */
  val ProfileDepth = 80

  /** Reference text per language — original sample sentences assembled
    * for this engine from each language's everyday closed-class
    * vocabulary (public knowledge; deliberately ASCII-only, since the
    * normalizer maps accented characters to spaces on BOTH engines). */
  val TrainingText: Seq[(String, String)] = Seq(
    "de" -> ("der hund und die katze sind in dem haus und die kinder " +
      "gehen in die schule wo sie lesen und schreiben lernen das wetter " +
      "ist heute gut und wir haben zeit mit den freunden zu sprechen " +
      "die stadt ist nicht weit von hier und der weg ist schnell wenn " +
      "man mit dem fahrrad kommt ich habe ein buch gelesen und es war " +
      "sehr gut denn die geschichte war voller ideen und bilder"),
    "en" -> ("the dog and the cat are in the house and the children go " +
      "to school where they learn to read and write the weather is " +
      "good today and we have time to talk with our friends the city " +
      "is not far from here and the way is quick when you come by " +
      "bike i have read a book and it was very good because the story " +
      "was full of ideas and pictures that stay with you for a while"),
    "es" -> ("el perro y el gato estan en la casa y los ninos van a la " +
      "escuela donde aprenden a leer y escribir el tiempo es bueno hoy " +
      "y tenemos tiempo para hablar con los amigos la ciudad no esta " +
      "lejos de aqui y el camino es rapido cuando vienes en bicicleta " +
      "he leido un libro y era muy bueno porque la historia estaba " +
      "llena de ideas y de imagenes que se quedan contigo un rato"),
    "fr" -> ("le chien et le chat sont dans la maison et les enfants " +
      "vont a l ecole ou ils apprennent a lire et a ecrire le temps " +
      "est bon aujourd hui et nous avons le temps de parler avec les " +
      "amis la ville n est pas loin d ici et le chemin est rapide " +
      "quand on vient a velo j ai lu un livre et il etait tres bon " +
      "parce que l histoire etait pleine d idees et d images"))

  /** Languages in prediction/tie-break order (lexicographic). */
  val Langs: Array[String] = TrainingText.map(_._1).toArray

  // ---- the gram pipeline (driver-side model build AND per-row kernel)

  /** Normalized, space-padded form of `text` per the gram definition. */
  def normalize(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length + 2)
    sb.append(' ')
    var lastSpace = true
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      val mapped =
        if (c >= 'a' && c <= 'z') c
        else if (c >= 'A' && c <= 'Z') (c + 32).toChar
        else ' '
      if (mapped != ' ') { sb.append(mapped); lastSpace = false }
      else if (!lastSpace) { sb.append(' '); lastSpace = true }
      i += 1
    }
    if (!lastSpace) sb.append(' ')
    sb.toString
  }

  /** Counts of every 1/2/3-gram of the normalized text that contains
    * at least one letter. */
  private def gramCounts(text: String): java.util.HashMap[String, Int] = {
    val t = normalize(text)
    val m = new java.util.HashMap[String, Int]()
    var n = 1
    while (n <= 3) {
      var i = 0
      val end = t.length - n
      while (i <= end) {
        var hasLetter = false
        var j = i
        while (j < i + n) {
          if (t.charAt(j) != ' ') hasLetter = true
          j += 1
        }
        if (hasLetter) {
          val g = t.substring(i, i + n)
          m.merge(g, 1, (a, b) => a + b)
        }
        i += 1
      }
      n += 1
    }
    m
  }

  /** The top-[[ProfileDepth]] grams by (count desc, gram asc), in rank
    * order (index 0 = rank 1). */
  def topGrams(text: String): Array[String] = {
    val m = gramCounts(text)
    val entries = new java.util.ArrayList(m.entrySet())
    entries.sort { (a, b) =>
      val byCount = Integer.compare(b.getValue, a.getValue)
      if (byCount != 0) byCount else a.getKey.compareTo(b.getKey)
    }
    val k = math.min(ProfileDepth, entries.size)
    val out = new Array[String](k)
    var i = 0
    while (i < k) { out(i) = entries.get(i).getKey; i += 1 }
    out
  }

  /** Language profiles as gram → 1-based rank, built once from
    * [[TrainingText]] (pure function of embedded constants). */
  val Profiles: Array[java.util.HashMap[String, Integer]] =
    TrainingText.map { case (_, text) =>
      val m = new java.util.HashMap[String, Integer]()
      topGrams(text).zipWithIndex.foreach { case (g, i) => m.put(g, i + 1) }
      m
    }.toArray

  // ---- static kernel (called from generated code) ----

  /** Classify one document: returns (lang_pred, ct_dist) as an
    * InternalRow. Deterministic: out-of-place distance per language,
    * argmin with lexicographic-first tie-break. */
  def classify(
      langs: Array[String],
      profiles: Array[java.util.HashMap[String, Integer]],
      s: UTF8String): InternalRow = {
    val doc = topGrams(s.toString)
    var bestLang = langs(0)
    var bestDist = Long.MaxValue
    var li = 0
    while (li < langs.length) {
      val prof = profiles(li)
      var dist = 0L
      var i = 0
      while (i < doc.length) {
        val r = prof.get(doc(i))
        dist += (if (r == null) ProfileDepth.toLong
                 else math.abs((i + 1).toLong - r.longValue()))
        i += 1
      }
      if (dist < bestDist) { bestDist = dist; bestLang = langs(li) }
      li += 1
    }
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(bestLang), bestDist))
  }

  /** Test hook: driver-side classification of a plain string. */
  private[graft] def classifyForTest(text: String): (String, Long) = {
    val r = classify(Langs, Profiles, UTF8String.fromString(text))
    (r.getUTF8String(0).toString, r.getLong(1))
  }

  case class CtLangId(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("lang_pred", StringType, nullable = false),
      StructField("ct_dist", LongType, nullable = false)))
    override def prettyName: String = "ct_lang_id"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs string, got ${other.simpleString}")
      }
    override def nullSafeEval(input: Any): Any =
      LangProfile.classify(Langs, Profiles, input.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val l = ctx.addReferenceObj("ctLangs", Langs, "java.lang.String[]")
      val p = ctx.addReferenceObj("ctProfiles", Profiles,
        "java.util.HashMap[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.LangProfile.classify($l, $p, $c);")
    }
    override protected def withNewChildInternal(
        newChild: Expression): CtLangId = copy(child = newChild)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  def ctLangIdCol(text: Column): Column =
    ColumnBridge.column(CtLangId(ColumnBridge.expression(text)))
}
