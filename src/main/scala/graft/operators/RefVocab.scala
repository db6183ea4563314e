package graft.operators

/** The reference application's classification vocabulary, held once so the
  * Spark plans and the DuckDB oracle SQL are generated from the same data
  * (hand-syncing two copies is how parity checks rot).
  *
  * Sources (cited, not copied — these are plain keyword lists):
  *  - template keywords: /root/reference/prompt_selector.py:37-57
  *    (`keyword_mappings`, insertion order = match priority)
  *  - topic taxonomy: /root/reference/utilities/text_utils.py:123-210
  *    (`load_enhanced_mental_health_taxonomy`, insertion order = tie-break)
  *  - safety patterns: /root/reference/safety_handler.py:18-44
  *    (`categories`, insertion order = match priority)
  */
object RefVocab {

  /** template name -> keywords; first template with any substring match wins
    * (prompt_selector.py:215-219), default "Others".
    */
  val templateKeywords: Seq[(String, Seq[String])] = Seq(
    "Empathy and Validation" -> Seq(
      "sad", "depressed", "down", "unhappy", "alone", "lonely", "grief",
      "loss", "hurt", "pain", "suffering", "cry", "tears", "heartbroken"),
    "Affirmation and Reassurance" -> Seq(
      "anxious", "worried", "stressed", "nervous", "fear", "scared", "panic",
      "overwhelmed", "frightened", "uneasy", "tense", "afraid"),
    "Providing Suggestions" -> Seq(
      "help", "advice", "tips", "suggestion", "guidance", "recommend",
      "strategy", "solution", "fix", "resolve", "approach", "technique",
      "method", "cope", "handle"),
    "Information" -> Seq(
      "why", "explain", "understand", "how", "what", "learn", "know",
      "curious", "information", "research", "fact", "science", "reason",
      "cause"),
    "Question" -> Seq(
      "confused", "unsure", "uncertain", "wonder", "think", "feel", "opinion"))

  val defaultTemplate = "Others"

  /** Step-3 category fallback (prompt_selector.py:221-232 +
    * generate_category_info prompt_selector.py:115-160): when no primary
    * keyword matches, the first category rule whose stem substring-matches
    * wins — stems like "depress" catch inflections ("depression") the
    * primary lists miss. Only categories that are valid prompt templates
    * participate (therapeutic_promt.py keys); the NER-derived Grief/
    * Interpersonal rules need spaCy entities and are intentionally not
    * reproduced.
    */
  val categoryFallback: Seq[(String, Seq[String])] = Seq(
    "Empathy and Validation" -> Seq(
      "depress", "hopeless", "sad", "suicid", "end my life", "kill myself",
      "worthless"),
    "Affirmation and Reassurance" -> Seq(
      "anxi", "worry", "panic", "fear", "stress"),
    "Providing Suggestions" -> Seq("help", "advice", "tip", "suggestion"),
    "Information" -> Seq("explain", "why", "how", "what", "reason"),
    "Cognitive Behavioral Therapy (CBT)" -> Seq(
      "thought", "belief", "think", "pattern"),
    "Mindfulness and Relaxation" -> Seq(
      "calm", "breathe", "relax", "mindful"))

  /** Full first-match rule chain: primaries, then the category fallback
    * (a fallback rule can only fire when no primary matched, so plain
    * concatenation preserves the reference's two-step semantics).
    */
  val templateRules: Seq[(String, Seq[String])] =
    templateKeywords ++ categoryFallback

  /** topic -> keywords; score = number of keywords present as substrings,
    * argmax with ties broken by taxonomy order (Python max() keeps the first
    * maximal entry, prompt_selector.py:322-325); all-zero -> default.
    * The reference's category-info "boosts" (prompt_selector.py:286-300) key
    * on names its category generator never emits, so they are dead code and
    * intentionally not reproduced.
    */
  val taxonomy: Seq[(String, Seq[String])] = Seq(
    "Depression" -> Seq(
      "depressed", "sad", "hopeless", "worthless", "guilt", "suicidal",
      "fatigue", "insomnia", "hypersomnia", "weight", "appetite",
      "concentration", "indecisive", "psychomotor", "anhedonia", "emptiness",
      "unmotivated", "tired", "can't eat", "can't sleep", "don't enjoy",
      "no interest", "meaningless"),
    "Anxiety" -> Seq(
      "anxious", "worry", "fear", "panic", "nervous", "tense", "stress",
      "phobia", "obsessive", "compulsive", "avoidance", "catastrophizing",
      "overthinking", "racing thoughts", "restless", "irritable", "on edge",
      "hypervigilant", "apprehensive", "dread", "arousal", "social anxiety"),
    "Trauma" -> Seq(
      "trauma", "ptsd", "flashback", "nightmare", "hyperarousal", "avoidance",
      "intrusion", "dissociate", "abuse", "assault", "violence", "accident",
      "disaster", "threat", "danger", "helpless", "horror", "numb",
      "detached", "triggered", "startle", "hypervigilant",
      "emotional dysregulation"),
    "Interpersonal" -> Seq(
      "relationship", "marriage", "partner", "spouse", "family", "friend",
      "colleague", "conflict", "intimacy", "attachment", "boundary",
      "communication", "trust", "abandonment", "rejection", "loneliness",
      "isolation", "connection", "breakup", "divorce", "separation",
      "betrayal", "argument", "misunderstanding"),
    "Identity" -> Seq(
      "self-esteem", "identity", "self-worth", "confidence", "imposter",
      "shame", "perfectionism", "failure", "inadequacy", "self-doubt",
      "body image", "self-criticism", "self-compassion", "validation",
      "purpose", "meaning", "values", "authentic", "true self", "gender",
      "sexuality", "culture"),
    "Adjustment" -> Seq(
      "grief", "loss", "bereavement", "change", "transition", "adaptation",
      "adjustment", "stress", "coping", "resilience", "life stage",
      "retirement", "career", "moving", "relocation", "major life event",
      "crisis", "upheaval", "uncertainty", "decision-making", "crossroads",
      "opportunity", "challenge"),
    "Behavior" -> Seq(
      "addiction", "substance", "alcohol", "drug", "gambling", "compulsive",
      "habit", "dependence", "withdrawal", "craving", "relapse", "recovery",
      "abstinence", "moderation", "harm-reduction", "impulse control",
      "self-regulation", "behavioral therapy", "reinforcement", "trigger"),
    "Wellness" -> Seq(
      "mindfulness", "meditation", "relaxation", "self-care", "resilience",
      "growth", "strength", "resource", "wellness", "prevention",
      "maintenance", "balance", "harmony", "fulfillment", "joy",
      "satisfaction", "gratitude", "meaning", "purpose", "flourishing",
      "thriving", "vitality"),
    "Cognition" -> Seq(
      "thought", "belief", "cognition", "distortion", "schema", "assumption",
      "automatic thought", "rumination", "worry", "attention", "memory",
      "concentration", "problem-solving", "decision-making", "perception",
      "interpretation", "reframe", "perspective", "mindset", "attribution"),
    "Grief & Loss" -> Seq(
      "bereavement", "loss", "mourning", "acceptance", "denial", "anger",
      "bargaining", "depression", "adaptation", "adjustment",
      "memorialization", "letting go", "moving on", "honoring", "memory"),
    "Self-Compassion" -> Seq(
      "self-kindness", "common humanity", "mindfulness", "self-criticism",
      "self-care", "forgiveness", "acceptance", "compassionate voice",
      "inner peace", "empathy"),
    "Guilt & Shame" -> Seq(
      "guilt", "shame", "self-judgment", "self-blame", "embarrassment",
      "regret", "wrongdoing", "redemption", "forgiveness", "moral distress",
      "humiliation", "self-forgiveness"),
    "Obsessive-Compulsive Disorder (OCD)" -> Seq(
      "obsession", "compulsion", "ritual", "perfectionism", "control",
      "anxiety", "reassurance-seeking", "intrusive thought", "cleaning",
      "checking", "counting", "hoarding"),
    "Suicidality & Self-Harm" -> Seq(
      "suicidal", "self-harm", "cutting", "despair", "hopelessness",
      "crisis", "emotional pain", "coping", "prevention", "life-threatening",
      "overwhelming"))

  val defaultTopic = "emotional_support"

  /** (category, severity, combined case-insensitive pattern); first matching
    * category in order wins (safety_handler.py:60-78 iterates dict order).
    */
  val safetyCategories: Seq[(String, String, String)] = Seq(
    ("suicide", "critical",
      "(?i)(suicide|kill myself|end my life|take my life|don't want to live" +
        "|want to die|no reason to live|can't go on|better off dead" +
        "|life is too painful|ending it all|my suicide note|planning to end" +
        "|how to commit suicide)"),
    ("self_harm", "high",
      "(?i)(cut myself|hurt myself|self harm|self-harm|injure myself" +
        "|burning myself|hitting myself|starve myself)"),
    ("violence", "high",
      "(?i)((kill|murder|hurt|attack|bomb|shoot) (someone|people|them|him|her)" +
        "|(planning|want|going) to (kill|murder|hurt|attack))"))

  /** Words preserved through the lemma pipeline's stopword filter
    * (/root/reference/utilities/keep_words.py:17-19 — pronouns and
    * be/have/do forms that carry therapeutic meaning).
    */
  val keepWords: Seq[String] = Seq(
    "i", "me", "my", "mine", "you", "your", "yours", "he", "him", "his",
    "she", "her", "hers", "it", "its", "we", "us", "our", "ours", "they",
    "them", "their", "theirs", "be", "am", "is", "are", "was", "were",
    "been", "being", "have", "has", "had", "having", "do", "does", "did",
    "doing")

  /** Stopword list for the lemma pipeline STUB. The reference filters with
    * spaCy's `is_stop` (/root/reference/utilities/text_utils.py:66-68); no
    * JVM spaCy, so this declared common-English list stands in. It
    * deliberately includes every keepWord so the keep-override is
    * observable, exactly as in the reference (spaCy stops pronouns too).
    */
  val lemmaStopwords: Seq[String] = keepWords ++ Seq(
    "the", "a", "an", "and", "or", "but", "if", "so", "of", "to", "in",
    "on", "at", "by", "for", "with", "about", "as", "from", "into",
    "that", "this", "these", "those", "there", "here", "when", "where",
    "which", "who", "whom", "what", "why", "how", "not", "no", "nor",
    "too", "very", "can", "will", "just", "should", "would", "could",
    "now", "than", "then", "once", "while", "because", "until",
    "against", "between", "through", "during", "before", "after",
    "above", "below", "up", "down", "out", "off", "over", "under",
    "again", "further", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "only", "own", "same")

  /** Suffix-strip lemma rules, first match wins: (suffix, min length,
    * chars cut, append). A deterministic stand-in for spaCy lemmata
    * (text_utils.py:51 tokenize_and_lemmatize) — same shape as Porter
    * step-1, engine-neutral (no regex dialect, just ends-with + substr).
    */
  val lemmaRules: Seq[(String, Int, Int, String)] = Seq(
    ("sses", 5, 2, ""), // classes -> class
    ("ies", 5, 3, "y"), // studies -> study
    ("ss", 0, 0, ""),   // guard: stress stays stress
    ("s", 4, 1, ""),    // thoughts -> thought
    ("ing", 6, 3, ""),  // feeling -> feel
    ("ed", 5, 2, ""))   // helped -> help

  /** Multi-label category rules (prompt_selector.py:99-160
    * generate_category_info): category -> (trigger substrings,
    * description); EVERY matching rule fires, unlike the single-label
    * template chain. The Grief/Interpersonal rules are the reference's
    * NER path stubbed as keyword presence — the reference string-matches
    * the extracted entity text against these same word lists, so on
    * single-word entities the semantics coincide.
    */
  val categoryRules: Seq[(String, Seq[String], String)] = Seq(
    ("Empathy and Validation",
      Seq("depress", "hopeless", "sad", "suicid", "end my life",
        "kill myself", "worthless"),
      "Supporting depression and hopelessness with validation"),
    ("Affirmation and Reassurance",
      Seq("anxi", "worry", "panic", "fear", "stress"),
      "Supporting anxiety with reassurance"),
    ("Trauma", Seq("trauma", "abuse", "assault", "ptsd"),
      "Supporting trauma recovery"),
    ("Grief", Seq("grief", "loss", "bereavement", "death", "died"),
      "Support for dealing with loss and grief"),
    ("Interpersonal",
      Seq("relationship", "partner", "breakup", "divorce", "marriage"),
      "Supporting relationship issues or interpersonal struggles"),
    ("Providing Suggestions", Seq("help", "advice", "tip", "suggestion"),
      "Offering gentle suggestions or strategies for improvement"),
    ("Information", Seq("explain", "why", "how", "what", "reason"),
      "Providing relevant psychoeducational information"),
    ("Cognitive Behavioral Therapy (CBT)",
      Seq("thought", "belief", "think", "pattern"),
      "Addressing thought patterns"),
    ("Mindfulness and Relaxation",
      Seq("calm", "breathe", "relax", "mindful"),
      "Guiding relaxation and mindfulness practices"))

  val defaultCategory: (String, String) =
    ("Others", "General therapeutic support")

  /** Markers that truncate a generated response at their first
    * case-insensitive occurrence (text_generator.py:178-182 dialogue
    * markers + :228-236 instruction markers, merged into one cut pass).
    */
  val responseMarkers: Seq[String] = Seq(
    "USER:", "THERAPIST:", "PATIENT:", "CLIENT:", "DOCTOR:",
    "Exercise:", "Instructions:", "Your response:", "Note to AI:",
    "USER QUESTION:", "THERAPEUTIC APPROACH:", "RESPONSE (keep",
    "PREVIOUS CONVERSATION:", "RELEVANT KNOWLEDGE:")

  /** Artifact-removal regexes for response cleaning
    * (text_generator.py:183-204), constrained to the RE2 ∩ Java dialect:
    * no lookaround, no backrefs, so one pattern string drives both
    * engines.
    */
  val responseArtifacts: Seq[(String, String)] = Seq(
    "Question \\d+:|Answer:|Response:" -> "",
    "(?i)\\bexercise:[^\\n]*" -> "",
    "\\[[^\\]]*\\]" -> "",
    "(?i)\\b(TR:|THERPST:|THERAP:|THERAPY:)" -> "")

  /** PII redaction rules for the training-data pipeline: (name, pattern,
    * replacement), applied in order (emails first — they contain digit
    * runs and dots that the later rules would otherwise bite into).
    * Patterns are in the RE2 ∩ Java dialect (no lookaround/backrefs) so
    * one string drives both engines. Standard C4/Dolma-style scrubbing.
    */
  val piiRules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
      "<IP>"),
    ("phone",
      "(\\+?[0-9]{1,3}[-. ]?)?\\(?[0-9]{3}\\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}",
      "<PHONE>"))

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic (public common-word lists; order = tie-break priority).
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "you", "that",
      "it", "for", "on", "with", "as", "this", "was", "are"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ich", "du",
      "mit", "ein", "eine", "zu", "auf", "sie", "von"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "en", "un",
      "una", "por", "con", "para", "del", "se"),
    "fr" -> Seq("le", "les", "et", "est", "un", "une", "je", "tu", "dans",
      "pour", "que", "qui", "sur", "pas", "vous"))

  val unknownLang = "und"

  /** English stopwords used by the document quality score. */
  val enStopwords: Seq[String] = langStopwords.head._2

  /** Toxicity lexicon for the stubbed toxicity screen
    * (/root/reference/text_generator.py:270-299 `is_toxic` runs a
    * transformer classifier; no model runs inside the engine, so the stub
    * scores lexicon-term density instead — the <5-word short-circuit and
    * the 0.7 threshold ARE the reference's). Placeholder terms: mild
    * negative vocabulary chosen so the synthetic corpus exercises both
    * sides of the threshold; a deployment supplies its own lexicon.
    */
  val toxicLexicon: Seq[String] = Seq(
    "kill", "hate", "crash", "broken", "slow", "stupid", "awful",
    "terrible", "worthless", "dead")

  /** Reference thresholds for the toxicity screen
    * (text_generator.py:274-276, 296).
    */
  val toxicMinWords = 5
  val toxicThreshold = 0.7
}
