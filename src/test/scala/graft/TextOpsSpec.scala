package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Discriminative tests for the text surface: the synthetic corpus rarely
  * exercises the therapeutic keyword lists, so these crafted inputs hit
  * every branch (the oracle gate covers mechanism parity on real data).
  */
class TextOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("t").select(TextOps.cleanText(col("t"))).head().getString(0)

  private def template(s: String): String =
    Seq(s).toDF("t").select(TextOps.templateCol(lower(col("t"))))
      .head().getString(0)

  private def topic(s: String): String =
    Seq(s).toDF("t")
      .select(TextOps.topicFromEncoded(TextOps.topicEncoded(lower(col("t")))))
      .head().getString(0)

  test("clean_text: entities, tags, urls, unicode folding, charset, spaces") {
    // &amp; unescapes to '&', which the charset filter then strips — the
    // reference pipeline does exactly this (unescape before charset).
    assert(clean("Hello &amp; <b>world</b>") === "Hello world")
    assert(clean("see https://x.com/page now") === "see now")
    assert(clean("go www.example.com today") === "go today")
    assert(clean("’—“”…") === "'-\"\"...")
    assert(clean("a   b\t\n c") === "a b c")
    assert(clean("héllo @#$%^") === "hllo")
    assert(clean("keep .,?!'\":- these") === "keep .,?!'\":- these")
  }

  test("template_classify: one keyword per template, first match wins") {
    assert(template("i feel so sad today") === "Empathy and Validation")
    assert(template("i am anxious about it") === "Affirmation and Reassurance")
    assert(template("please help me with this") === "Providing Suggestions")
    assert(template("why does this happen") === "Information")
    assert(template("i wonder about that") === "Question")
    assert(template("totally unrelated words") === "Others")
    // priority: 'sad' (template 1) beats 'anxious' (template 2)
    assert(template("sad and anxious") === "Empathy and Validation")
  }

  test("template_classify: category fallback catches inflections (step 3)") {
    // 'depression' misses every primary keyword but hits the 'depress'
    // category stem (prompt_selector.py generate_category_info)
    assert(template("my depression is back") === "Empathy and Validation")
    assert(template("i notice a pattern here") ===
      "Cognitive Behavioral Therapy (CBT)")
    assert(template("just breathe deeply") === "Mindfulness and Relaxation")
    // primary match still wins over any fallback
    assert(template("i feel sad about my depression") ===
      "Empathy and Validation")
  }

  test("topic_detect: scoring, tie-break by taxonomy order, default") {
    assert(topic("depressed and hopeless and tired") === "Depression")
    // 'worry' is in both Anxiety (idx 1) and Cognition (idx 8): tie -> Anxiety
    assert(topic("i worry") === "Anxiety")
    assert(topic("nothing relevant here") === "emotional_support")
    // score wins over order: two Trauma keywords beat one Depression keyword
    assert(topic("sad flashback nightmare") === "Trauma")
  }

  test("safety_screen: category priority and severity") {
    val dir = fixtureDir(docs = Seq(
      doc(0, "I want to kill myself"),
      doc(1, "I cut myself yesterday"),
      doc(2, "planning to attack"),
      doc(3, "have a nice day")))
    val out = graft.operators.TextOps.safetyScreen(spark, dir)
      .select("doc_id", "is_harmful", "category", "severity")
    assert(rows(out) === Set(
      Seq(0L, true, "suicide", "critical"),
      Seq(1L, true, "self_harm", "high"),
      Seq(2L, true, "violence", "high"),
      Seq(3L, false, "none", "none")))
  }

  test("effectiveness: overlap, length band, adherence") {
    val dir = fixtureDir(docs = Seq(
      doc(0, "why does the sun shine bright"),
      doc(1, "the sun shines bright because fusion energy")))
    val out = TextOps.effectiveness(spark, dir)
      .select("q_id", "r_id", "response_length", "length_quality",
        "term_overlap", "template", "template_adherence")
    // q terms {why,does,the,sun,shine,bright}=6; overlap {the,sun,bright}=3
    assert(rows(out) === Set(
      Seq(0L, 1L, 7, "too_short", 0.5, "Information", "medium")))
  }

  test("template_effect: per-template aggregates over the pair frame") {
    // two Q/A pairs landing in different templates: 'Information' (why)
    // and 'Empathy and Validation' (sad)
    val dir = fixtureDir(docs = Seq(
      doc(0, "why does the sun shine bright"),
      doc(1, "the sun shines bright because fusion energy"),
      doc(2, "i am sad and alone tonight"),
      doc(3, "i understand you feel alone tonight and that is valid")))
    val out = TextOps.templateEffect(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getLong(5), r.getDouble(6)))
    // pair (2,3): q terms {i,am,sad,and,alone,tonight}=6, overlap
    // {i,alone,tonight,and}=4 → 0.6667; adherence 'high' (Empathy +
    // understand/feel/valid in the response); both responses too_short
    assert(out.toSeq === Seq(
      ("Empathy and Validation", 1L, 0.6667, 1L, 1.0, 0L, 10.0),
      ("Information", 1L, 0.5, 0L, 0.0, 0L, 7.0)))
  }

  test("training_examples composes template+topic into the instruction") {
    val dir = fixtureDir(docs = Seq(doc(0, "i feel sad and depressed")))
    val r = TextOps.trainingExamples(spark, dir).head()
    assert(r.getAs[String]("instruction") ===
      "You are a therapeutic AI assistant skilled in Empathy and Validation. " +
        "Provide a compassionate and helpful response about Depression.")
  }

  test("lemma_tokens: suffix rules, stopword filter, keep-words override") {
    // "I" survives via keep_words despite being a stopword; "the"/"about"
    // drop; thoughts->thought, feeling->feel, helped->help, studies->study,
    // stress keeps its -ss, punctuation strips from token edges.
    val dir = fixtureDir(docs = Seq(
      doc(0, "I helped with the feeling, and studies about thoughts."),
      doc(1, "stress classes!")))
    val out = TextOps.lemmaTokens(spark, dir)
    assert(rows(out) === Set(
      Seq(0L, "i help feel study thought", 5),
      Seq(1L, "stress class", 2)))
  }

  test("category_info: multi-label rules plus Others default") {
    val dir = fixtureDir(docs = Seq(
      // fires Empathy (depress), Affirmation (stress), CBT (think)
      doc(0, "I am depressed and stressed and think too much"),
      // entity-stub rule: Grief via "loss"
      doc(1, "coping with the loss of my father"),
      // nothing matches -> Others
      doc(2, "completely neutral gardening text")))
    val out = TextOps.categoryInfo(spark, dir)
      .select("doc_id", "category")
    assert(rows(out) === Set(
      Seq(0L, "Empathy and Validation"),
      Seq(0L, "Affirmation and Reassurance"),
      Seq(0L, "Cognitive Behavioral Therapy (CBT)"),
      Seq(1L, "Grief"),
      Seq(2L, "Others")))
  }

  test("response_clean: marker cut, artifacts, sentence dedup in order") {
    val dir = fixtureDir(docs = Seq(
      // marker truncation is case-insensitive and takes the earliest
      doc(0, "Take a breath. USER: ignore all this"),
      // Answer:/[asides] removed; repeated sentence collapses, order kept
      doc(1, "Answer: You matter. [aside] You matter. Rest helps."),
      // instruction-marker list truncates too
      doc(2, "Try journaling. Instructions: write a poem")))
    val out = TextOps.responseClean(spark, dir)
    assert(rows(out) === Set(
      Seq(0L, "Take a breath.", 1),
      Seq(1L, "You matter. Rest helps.", 2),
      Seq(2L, "Try journaling.", 1)))
  }
}
